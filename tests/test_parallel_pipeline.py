"""Product-pipeline data parallelism: the real Processor detection loop
sharded over a virtual 8-device CPU mesh (conftest forces 8 CPU devices)
must produce the same FrameResults as the unsharded loop."""
import logging

import numpy as np
import pytest

import jax

from mav_detection_tpu.core.config import RunConfig
from mav_detection_tpu.data.synthetic import SyntheticDataset, SyntheticParams
from mav_detection_tpu.pipeline.processor import Processor


def _run(devices: int, n_frames: int = 9, batch_size: int = 8):
    # batch_size matches the mesh size so the PRNG key sequence (and so the
    # stochastic FoE vote) is identical between sharded and unsharded runs
    config = RunConfig(logger=logging.getLogger("test"), dataset="synthetic",
                       mode="FLOW_FOE_CLUSTERING", flow_source="GROUND_TRUTH",
                       batch_size=batch_size, devices=devices, headless=True)
    proc = Processor(config)
    proc.dataset = SyntheticDataset(params=SyntheticParams(
        height=96, width=128, n_frames=n_frames))
    proc.save_images = False
    try:
        return proc.run_detection_foe(), proc
    finally:
        proc.release()


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
class TestShardedProcessor:
    def test_sharded_matches_unsharded(self):
        res1, _ = _run(devices=0)
        res8, proc8 = _run(devices=8)
        assert proc8.mesh is not None
        assert set(res1) == set(res8)
        for i in res1:
            a, b = res1[i], res8[i]
            np.testing.assert_allclose(a.foe_dense, b.foe_dense, atol=1e-3)
            np.testing.assert_allclose(
                [a.tpr, a.fpr, a.tpr_fixed, a.fpr_fixed],
                [b.tpr, b.fpr, b.tpr_fixed, b.fpr_fixed], atol=1e-5)

    def test_psum_metrics_collected(self):
        _, proc = _run(devices=8)
        assert proc._psum_metrics
        tprs = [t for t, _, _ in proc._psum_metrics]
        assert all(np.isfinite(tprs))

    def test_batch_padding_to_mesh(self):
        """9 frames = 8 pairs... 8 pairs with batch 4 -> padded batches of 8
        on an 8-device mesh; results must cover every pair exactly once."""
        res, proc = _run(devices=8, n_frames=6, batch_size=4)  # 5 pairs
        assert len(res) == 5
        assert proc.batch_size == 8  # raised to the mesh size

    def test_raft_flow_source_shards_over_mesh(self):
        """--flow-source RAFT with --devices: net inference runs data-
        parallel (batch sharded, params replicated) and matches the
        unsharded flow bit-for-bit."""
        from mav_detection_tpu.models.raft import raft_flow_batch
        from mav_detection_tpu.parallel import make_mesh, shard_frame_batch

        rng = np.random.default_rng(3)
        # /8 stride + 4 corr-pyramid levels need >= 64x96 images
        prevs = np.asarray(rng.random((8, 64, 96, 3)) * 255, np.float32)
        currs = np.asarray(rng.random((8, 64, 96, 3)) * 255, np.float32)
        import jax.numpy as jnp

        plain = np.asarray(raft_flow_batch(jnp.asarray(prevs),
                                           jnp.asarray(currs), iters=2))
        mesh = make_mesh(8)
        ps, cs = shard_frame_batch(mesh, jnp.asarray(prevs),
                                   jnp.asarray(currs))
        sharded = np.asarray(raft_flow_batch(ps, cs, iters=2))
        # GSPMD may pick different conv algorithms per sharding; flow agrees
        # to well under any detection-relevant scale (atol in px)
        np.testing.assert_allclose(sharded, plain, atol=0.02)
