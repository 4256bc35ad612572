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
