"""Out-of-family model gates (VERDICT r2 #2).

Every learned-model gate in round 2 was scored on held-out seeds of the SAME
procedural family the models train on. These tests hold the shipped
checkpoints to gates on two genuinely different renderers with exact GT:
the cv2-rendered bench scene family and the mock simulator's ray-cast
captures (GT flow synthesized from view-projection matrices + depth — the
reference's own GT pipeline, ``airsim_optical_flow.py:87-149``).

Gates are calibrated from tools/cross_domain_eval.py runs recorded in
PERF.md "Cross-domain evaluation"; they are regression rails, not targets.
LK dense flow gets its first accuracy gate here (VERDICT r2 #6: <= 1 px
interior on a smooth scene).
"""
import os
import sys

import numpy as np
import pytest

# e2e checkpoint gates over two full renderer families: the module-scoped
# fixtures alone cost ~6 min on this box — slow tier by definition
pytestmark = pytest.mark.slow

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mav_detection_tpu.models import pretrained  # noqa: E402
from tools.cross_domain_eval import bench_scene_metrics, mock_sim_metrics  # noqa: E402


@pytest.fixture(scope="module")
def bench_metrics():
    return bench_scene_metrics(240, 320, seeds=[1], iters=8)


@pytest.fixture(scope="module")
def sim_metrics():
    return mock_sim_metrics(iters=8)


class TestBenchFamily:
    def test_farneback_epe(self, bench_metrics):
        assert bench_metrics["fb_epe"] < 0.25, bench_metrics

    def test_lk_dense_epe(self, bench_metrics):
        # VERDICT r2 #6: the LUCAS_KANADE flow source finally has a gate.
        # Normalized-convolution densification + affine fallback measured
        # 0.16 px on this family (box-average was 0.48); rail at 2x.
        assert bench_metrics["lk_epe"] < 0.35, bench_metrics

    @pytest.mark.skipif(not pretrained.has_checkpoint("raft"),
                        reason="no shipped raft checkpoint")
    def test_raft_epe(self, bench_metrics):
        assert bench_metrics["raft_epe"] < 0.4, bench_metrics
        assert bench_metrics["raft_drone_epe"] < 2.0, bench_metrics

    @pytest.mark.skipif(not pretrained.has_checkpoint("sky"),
                        reason="no shipped sky checkpoint")
    def test_sky(self, bench_metrics):
        assert bench_metrics["sky_tpr"] > 0.9, bench_metrics
        assert bench_metrics["sky_fpr"] < 0.05, bench_metrics

    @pytest.mark.skipif(not pretrained.has_checkpoint("yolo"),
                        reason="no shipped yolo checkpoint")
    def test_yolo(self, bench_metrics):
        assert bench_metrics["yolo_iou"] > 0.4, bench_metrics


class TestMockSimFamily:
    def test_farneback_epe(self, sim_metrics):
        assert sim_metrics["fb_epe"] < 0.6, sim_metrics

    @pytest.mark.skipif(not pretrained.has_checkpoint("raft"),
                        reason="no shipped raft checkpoint")
    def test_raft_epe(self, sim_metrics):
        assert sim_metrics["raft_epe"] < 1.2, sim_metrics
        assert sim_metrics["raft_drone_epe"] < 2.0, sim_metrics

    @pytest.mark.skipif(not pretrained.has_checkpoint("sky"),
                        reason="no shipped sky checkpoint")
    def test_sky(self, sim_metrics):
        assert sim_metrics["sky_tpr"] > 0.9, sim_metrics
        assert sim_metrics["sky_fpr"] < 0.05, sim_metrics

    @pytest.mark.skipif(not pretrained.has_checkpoint("yolo"),
                        reason="no shipped yolo checkpoint")
    def test_yolo(self, sim_metrics):
        assert sim_metrics["yolo_iou"] > 0.4, sim_metrics


class TestHiresLK:
    """LK at the reference's native 1920x1024 (VERDICT r4 #5): the
    reference's sparse path fed the FoE at full AirSim resolution
    (``/root/reference/src/lucas_kanade.py:22-29``). Gates calibrated from
    tools/hires_lk_probe.py (PERF.md "LK at reference resolution"):
    sparse tracks 0.051 px mean EPE over 1945 survivors; densified field
    0.82 px interior (interpolation between tracks — the dense PRODUCT path
    at this scale is Farneback at 0.486 px; LK's product role is the sparse
    FoE diet). Rails at ~2x the measured values."""

    def test_sparse_tracks_and_dense_field(self):
        import jax.numpy as jnp

        import bench
        from mav_detection_tpu.ops.flow.lucas_kanade import (
            lk_dense_flow,
            lucas_kanade_track,
            shi_tomasi_corners,
        )

        h, w = 1024, 1920
        prev8, curr8, gt = bench.make_scene(
            0, h=h, w=w, foe=(w * 0.41, h * 0.4), expansion=0.006,
            drone_pos=(430.0, 260.0), drone_vel=(6.0, 4.0), drone_radius=22.0)
        g0 = jnp.asarray(prev8, jnp.float32)
        g1 = jnp.asarray(curr8, jnp.float32)

        corners = shi_tomasi_corners(g0, max_corners=2000, quality_level=0.05)
        tracked = lucas_kanade_track(g0, g1, corners.points)
        ok = np.asarray(corners.valid & tracked.status)
        assert ok.sum() >= 1500, int(ok.sum())
        pts = np.asarray(corners.points)[ok]
        disp = np.asarray(tracked.points - corners.points)[ok]
        gt_at = gt[np.clip(pts[:, 1].astype(int), 0, h - 1),
                   np.clip(pts[:, 0].astype(int), 0, w - 1)]
        track_epe = np.linalg.norm(disp - gt_at, axis=-1)
        assert track_epe.mean() < 0.12, float(track_epe.mean())

        dense = np.asarray(lk_dense_flow(g0, g1, max_corners=2000))
        epe = float(np.linalg.norm(dense - gt, axis=-1)[16:-16, 16:-16].mean())
        assert epe < 1.6, epe


class TestRAFTAdvantage:
    """Demonstrate-or-demote RAFT (VERDICT r4 #9), statement of record in
    PERF.md "RAFT advantage families". The probe families target the
    failure modes of LOCAL least squares; measured (240x320, CPU):
    RAFT wins exactly one — the aperture-ambiguous periodic grating
    (1.90 vs 3.16 px: a 12 px window on a period-8 grating aliases to the
    nearest lattice shift; the learned prior picks the true one) — and
    LOSES lowcontrast (5.98 vs 3.04), boundary (2.59 vs 0.78) and the
    bench-texture control (1.46 vs 0.0003). Farneback therefore stays the
    product default; RAFT is the trainable path with this one demonstrated
    niche. These rails pin both halves of that statement."""

    @pytest.fixture(scope="class")
    def families(self):
        from tools.raft_advantage_probe import make_families
        return make_families(240, 320)

    @staticmethod
    def _epe_pair(families, name):
        import jax.numpy as jnp

        from mav_detection_tpu.models.raft import raft_flow
        from mav_detection_tpu.ops.flow import farneback_flow, tuned_flow_params

        prev, curr, gt = families[name]
        h, w = prev.shape
        fb = np.asarray(farneback_flow(jnp.asarray(prev), jnp.asarray(curr),
                                       tuned_flow_params(h, w)))
        rf = np.asarray(raft_flow(pretrained.load_raft_params(),
                                  jnp.asarray(prev), jnp.asarray(curr)))
        inner = np.s_[16:-16, 16:-16]
        return (float(np.linalg.norm(fb - gt, axis=-1)[inner].mean()),
                float(np.linalg.norm(rf - gt, axis=-1)[inner].mean()))

    def test_raft_wins_grating(self, families):
        fb, rf = self._epe_pair(families, "grating")
        assert rf < 0.8 * fb, (rf, fb)

    def test_farneback_wins_control(self, families):
        fb, rf = self._epe_pair(families, "control")
        assert fb < 0.5 * rf, (fb, rf)
