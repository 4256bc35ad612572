"""Temporal scan engine + chunked-video sharding (SURVEY §5 long-context).

Conftest forces an 8-device CPU mesh, so the chunked path runs real
shard_map + ppermute halo exchange.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mav_detection_tpu.data.synthetic import SyntheticDataset, SyntheticParams
from mav_detection_tpu.ops.flow.farneback import FarnebackParams
from mav_detection_tpu.parallel import make_mesh
from mav_detection_tpu.pipeline.detector import DetectionStep
from mav_detection_tpu.pipeline.temporal import (
    detect_sequence_scan,
    detect_video_chunked,
)

PARAMS = FarnebackParams(warp="separable", fast=True, max_shift=8)
CONFIG = DetectionStep(foe_samples=256)


@pytest.fixture(scope="module")
def seq():
    ds = SyntheticDataset(params=SyntheticParams(
        height=96, width=128, n_frames=16, expansion=0.02, foe=(70.0, 45.0)))
    T = ds.N
    gray = np.stack([
        np.asarray(ds.get_frame(i), np.float32)[..., 0] for i in range(T)])
    omegas = np.stack([
        np.asarray(ds.get_angular_difference(max(i - 1, 0), i), np.float64)
        / ds.params.dt for i in range(T)]).astype(np.float32)
    dts = np.full((T,), ds.params.dt, np.float32)
    segs = np.stack([np.asarray(ds.get_segmentation(i))[..., 0]
                     for i in range(T)])
    skys = np.stack([np.asarray(ds.get_sky_segmentation(i)) for i in range(T)])
    depths = np.stack([np.asarray(ds.get_depth(i), np.float32)
                       for i in range(T)])
    foes = np.stack([np.asarray(ds.get_gt_foe(i), np.float32)
                     for i in range(T)])
    return tuple(map(jnp.asarray, (gray, omegas, dts, segs, skys, depths,
                                   foes)))


class TestSequenceScan:
    def test_scan_produces_per_transition_outputs(self, seq):
        frames = seq[0]
        scal, history = detect_sequence_scan(
            *seq, jax.random.PRNGKey(0), params=PARAMS, config=CONFIG,
            history_len=4)
        T = frames.shape[0]
        assert scal.foe.shape == (T - 1, 2)
        assert np.isfinite(np.asarray(scal.foe)).all()
        # FoE should localize near GT on the expanding scene (median over time)
        err = np.linalg.norm(np.asarray(scal.foe) - np.array([70.0, 45.0]),
                             axis=-1)
        assert np.median(err) < 25.0
        assert history.buffer.shape == (4, 96, 128, 2)
        # the history holds real flow (nonzero), index wrapped correctly
        assert float(jnp.abs(history.buffer).max()) > 0.1

    @pytest.mark.slow
    def test_scan_sparse_foe_traces(self, seq):
        """track_sparse=True: the scan carries the LK FeaturePool + trace
        ring and emits a per-transition trace-based sparse FoE (reference
        get_FOE_sparse + rollback, focus_of_expansion.py:88-148). On the
        expanding scene the traces' motion lines must converge near the GT
        FoE once tracks accumulate baseline."""
        scal, history, foe_sparse = detect_sequence_scan(
            *seq, jax.random.PRNGKey(0), params=PARAMS, config=CONFIG,
            history_len=4, track_sparse=True, n_tracks=128)
        T = seq[0].shape[0]
        fs = np.asarray(foe_sparse)
        assert fs.shape == (T - 1, 2)
        assert np.isfinite(fs).all()
        # skip the warm-up transitions (rollback baseline still short)
        err = np.linalg.norm(fs[4:] - np.array([70.0, 45.0]), axis=-1)
        assert np.median(err) < 25.0
        # dense-path outputs are unchanged by the extra carried state
        scal_plain, _ = detect_sequence_scan(
            *seq, jax.random.PRNGKey(0), params=PARAMS, config=CONFIG,
            history_len=4)
        np.testing.assert_allclose(np.asarray(scal.foe),
                                   np.asarray(scal_plain.foe), atol=1e-4)

    @pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
    @pytest.mark.slow
    def test_chunked_matches_scan(self, seq):
        """Chunked sharding over 8 devices must reproduce the serial scan's
        transitions exactly (same flow pairs, same keys modulo sampling —
        compare the deterministic metrics, not the stochastic FoE)."""
        mesh = make_mesh(8)
        scal_chunked = detect_video_chunked(
            mesh, *seq, jax.random.PRNGKey(0), params=PARAMS, config=CONFIG)
        scal_serial, _ = detect_sequence_scan(
            *seq, jax.random.PRNGKey(0), params=PARAMS, config=CONFIG)
        assert scal_chunked.tpr.shape == scal_serial.tpr.shape
        # keys derive from the global transition index in BOTH paths, so the
        # chunked result — including the halo-exchanged boundary transitions
        # — matches the serial scan bit-for-bit (up to fp reduction order)
        np.testing.assert_allclose(np.asarray(scal_chunked.foe),
                                   np.asarray(scal_serial.foe), atol=1e-3)
        np.testing.assert_allclose(np.asarray(scal_chunked.tpr),
                                   np.asarray(scal_serial.tpr), atol=1e-5)
        np.testing.assert_allclose(np.asarray(scal_chunked.sky_tpr),
                                   np.asarray(scal_serial.sky_tpr), atol=1e-5)

    @pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
    def test_chunked_rejects_indivisible(self, seq):
        mesh = make_mesh(8)
        with pytest.raises(ValueError):
            detect_video_chunked(mesh, seq[0][:10], *seq[1:],
                                 jax.random.PRNGKey(0))


class TestProcessorScanEngine:
    """--engine scan|chunked reachability through the product Processor
    (round-1 VERDICT pattern: a library path is only done when the CLI can
    drive it)."""

    def _make_proc(self, engine, devices=0):
        import logging

        from mav_detection_tpu.core.config import RunConfig
        from mav_detection_tpu.pipeline.processor import Processor

        cfg = RunConfig(logger=logging.getLogger("t"), dataset="synthetic",
                        mode="FLOW_FOE_CLUSTERING", engine=engine,
                        devices=devices, headless=True)
        proc = Processor(cfg)
        proc.dataset = SyntheticDataset(params=SyntheticParams(
            height=96, width=128, n_frames=7, expansion=0.02,
            foe=(70.0, 45.0)))
        return proc

    @pytest.mark.slow
    def test_scan_engine_end_to_end(self):
        proc = self._make_proc("scan")
        results = proc.run_detection()
        assert len(results) == 6
        foe_err = [np.linalg.norm(np.asarray(r.foe_dense)
                                  - np.asarray(r.foe_gt))
                   for r in results.values()]
        assert np.isfinite(foe_err).all() and np.median(foe_err) < 15.0
        assert all(np.isfinite(r.tpr_fixed) for r in results.values())

    @pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
    @pytest.mark.slow
    def test_chunked_engine_pads_and_runs(self):
        # n_frames=7 is NOT divisible by 8 devices: the engine pads by
        # repeating the last frame and trims the extra transitions
        proc = self._make_proc("chunked", devices=8)
        results = proc.run_detection()
        assert len(results) == 6
        assert all(np.isfinite(r.foe_dense).all() for r in results.values())

    def test_chunked_without_mesh_raises(self):
        proc = self._make_proc("chunked")
        with pytest.raises(ValueError):
            proc.run_detection()

    def test_bad_engine_rejected(self):
        import logging

        from mav_detection_tpu.core.config import RunConfig

        with pytest.raises(ValueError):
            RunConfig(logger=logging.getLogger("t"), dataset="synthetic",
                      engine="warp9")
