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

    @pytest.mark.slow
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


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
class TestSpatialFarneback:
    """Row-sharded hi-res Farneback (parallel/spatial.py): 8-way spatial
    decomposition with ppermute halo exchange must reproduce the unsharded
    separable-warp solver."""

    def _scene(self, h, w, seed=0):
        # smooth non-uniform warp of a textured image (same family as the
        # bench scene: trackable, analytic-ish motion)
        rng = np.random.default_rng(seed)
        ys, xs = np.mgrid[0:h, 0:w].astype(np.float32)
        tex = (120 + 55 * np.sin(0.11 * xs + 0.07 * ys)
               + 30 * np.sin(0.31 * xs - 0.17 * ys)
               + 18 * np.sin(0.53 * xs + 0.41 * ys))
        dx = 3.0 + 1.5 * np.sin(2 * np.pi * ys / h)
        dy = -2.0 + 1.0 * np.cos(2 * np.pi * xs / w)
        import jax.numpy as jnp
        from mav_detection_tpu.ops.geometry.warp import sample_bilinear_replicate

        curr = np.asarray(sample_bilinear_replicate(
            jnp.asarray(tex)[..., None], jnp.asarray(xs + dx),
            jnp.asarray(ys + dy)))[..., 0]
        return tex.astype(np.float32), curr.astype(np.float32)

    @pytest.mark.slow
    def test_matches_unsharded(self):
        from mav_detection_tpu.ops.flow import FarnebackParams, farneback_flow
        from mav_detection_tpu.parallel import farneback_flow_spatial, make_mesh

        import jax.numpy as jnp

        h, w = 192, 160
        prev, curr = self._scene(h, w)
        params = FarnebackParams(warp="separable", levels=2, pyr_scale=0.5,
                                 iterations=6, max_shift=8)
        mesh = make_mesh()
        ref = np.asarray(farneback_flow(jnp.asarray(prev), jnp.asarray(curr),
                                        params))
        sp = np.asarray(farneback_flow_spatial(jnp.asarray(prev),
                                               jnp.asarray(curr),
                                               params, mesh))
        assert sp.shape == ref.shape
        diff = np.abs(sp - ref)
        # exact decomposition: only matmul-tiling float reassociation left
        assert diff.max() < 1e-3, f"max diff {diff.max()}"

    def test_rejects_indivisible_height(self):
        from mav_detection_tpu.parallel import farneback_flow_spatial, make_mesh

        import jax.numpy as jnp

        mesh = make_mesh()
        img = jnp.zeros((190, 64), jnp.float32)
        with pytest.raises(ValueError):
            farneback_flow_spatial(img, img, mesh=mesh)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
class TestSpatialEngine:
    """--engine spatial through the product Processor: per-frame row-sharded
    Farneback, detection results must match the unsharded batch engine."""

    def _run(self, engine, devices):
        config = RunConfig(logger=logging.getLogger("test"),
                           dataset="synthetic", mode="FLOW_FOE_CLUSTERING",
                           flow_source="FARNEBACK", batch_size=4,
                           devices=devices, engine=engine, headless=True)
        proc = Processor(config)
        proc.dataset = SyntheticDataset(params=SyntheticParams(
            height=192, width=128, n_frames=5))
        proc.save_images = False
        try:
            return proc.run_detection_foe()
        finally:
            proc.release()

    @pytest.mark.slow
    def test_spatial_matches_batch(self):
        res_b = self._run("batch", devices=0)
        res_s = self._run("spatial", devices=8)
        assert set(res_b) == set(res_s)
        for i in res_b:
            # flow solvers differ only by warp impl (auto vs separable) and
            # the sharded decomposition's float reassociation
            np.testing.assert_allclose(res_b[i].foe_dense,
                                       res_s[i].foe_dense, atol=2.0)
            np.testing.assert_allclose(
                [res_b[i].tpr_fixed, res_b[i].fpr_fixed],
                [res_s[i].tpr_fixed, res_s[i].fpr_fixed], atol=0.05)

    def test_spatial_requires_mesh(self):
        with pytest.raises(ValueError, match="devices"):
            self._run("spatial", devices=0)

    def test_spatial_rejects_net_flow(self):
        config = RunConfig(logger=logging.getLogger("test"),
                           dataset="synthetic", mode="FLOW_FOE_CLUSTERING",
                           flow_source="RAFT", devices=8, engine="spatial",
                           headless=True)
        with pytest.raises(ValueError, match="spatial"):
            Processor(config)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
class TestSpatialRAFT:
    @pytest.mark.slow
    def test_row_sharded_inference_matches_unsharded(self):
        """raft_flow_spatial: GSPMD partitions the inference graph along the
        sharded row axis (conv halo exchange + per-row volume matmuls);
        results must match the unsharded graph."""
        from mav_detection_tpu.models.raft import (RAFTConfig, create_raft,
                                                   raft_flow)
        from mav_detection_tpu.parallel import make_mesh
        from mav_detection_tpu.parallel.spatial import raft_flow_spatial

        import jax.numpy as jnp

        cfg = RAFTConfig(feature_dim=32, hidden_dim=32, context_dim=32,
                         corr_levels=2, corr_radius=2, iters=2,
                         materialize_corr=False)
        _, params = create_raft(config=cfg, image_hw=(64, 96))
        rng = np.random.default_rng(0)
        i1 = jnp.asarray(rng.integers(0, 255, (64, 96, 3)), jnp.uint8)
        i2 = jnp.asarray(rng.integers(0, 255, (64, 96, 3)), jnp.uint8)
        mesh = make_mesh()
        ref = np.asarray(raft_flow(params, i1, i2, iters=2, config=cfg))
        sp = np.asarray(raft_flow_spatial(i1, i2, params, mesh, iters=2,
                                          config=cfg))
        # partitioned bf16 convs reassociate differently under GSPMD —
        # ~0.02 px, the same scale as vmapped-vs-single conv batching and
        # far below the 0.5 px accuracy gates
        diff = np.abs(sp - ref)
        assert diff.max() < 0.05, f"max diff {diff.max()}"
        assert diff.mean() < 0.01


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
class TestSpatialFallbacks:
    @pytest.mark.slow
    def test_indivisible_height_falls_back_to_batch(self):
        """Heights that don't divide by the mesh use the unsharded solver
        (edge-padding would displace the border down-weight ramp)."""
        import jax.numpy as jnp

        config = RunConfig(logger=logging.getLogger("test"),
                           dataset="synthetic", mode="FLOW_FOE_CLUSTERING",
                           flow_source="FARNEBACK", devices=8,
                           engine="spatial", headless=True)
        proc = Processor(config)
        rng = np.random.default_rng(0)
        prevs = jnp.asarray(rng.random((2, 190, 64)) * 255, jnp.float32)
        currs = jnp.asarray(rng.random((2, 190, 64)) * 255, jnp.float32)
        flow = np.asarray(proc._flow_spatial_pairs(prevs, currs))
        assert flow.shape == (2, 190, 64, 2)
        assert np.isfinite(flow).all()
