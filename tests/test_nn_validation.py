"""NN detection-mode validation end-to-end (reference validator.py:95-118,
154-161): local TinyYOLO inference over the sequence, box-string protocol,
IoU-vs-annotation stats, ious.png artifact."""
import json
import os

import numpy as np
import pytest

from mav_detection_tpu.core.config import RunConfig
from mav_detection_tpu.data.synthetic import SyntheticDataset, SyntheticParams
from mav_detection_tpu.eval.validator import Validator
from mav_detection_tpu.models import pretrained


@pytest.fixture()
def nn_config(tmp_path, monkeypatch):
    monkeypatch.setenv("SYNTHETIC_PATH", str(tmp_path / "data"))
    cfg = RunConfig(dataset="synthetic", mode="FLOW_FOE_YOLO", validate=True,
                    headless=True)
    params = SyntheticParams(height=128, width=160, n_frames=5,
                             drone_radius=10)
    cfg.get_dataset = lambda: SyntheticDataset(
        params=params, materialize_to=str(tmp_path / "data"))
    return cfg


class TestLocalInference:
    @pytest.mark.skipif(not pretrained.has_checkpoint("yolo"),
                        reason="no shipped yolo checkpoint")
    def test_run_nn_validation_with_shipped_weights(self, nn_config):
        v = Validator(nn_config)
        v.dataset = nn_config.get_dataset()
        stats = v.run_nn_validation()
        assert stats["iou_mean"] is not None
        assert 0.0 <= stats["iou_mean"] <= 1.0
        assert os.path.exists(os.path.join(v.dataset.seq_path, "ious.png"))
        # box-string cache landed (content-keyed, reference idiom)
        cache_dir = os.path.join(v.dataset.seq_path, "bounding-boxes")
        cached = os.listdir(cache_dir)
        assert len(cached) == 1
        with open(os.path.join(cache_dir, cached[0])) as f:
            raw = json.load(f)
        # protocol: parse_frames consumes it
        parsed = Validator.parse_frames(raw)
        assert set(parsed) == set(range(v.dataset.N))

    def test_nn_validation_without_checkpoint_raises(self, nn_config,
                                                     monkeypatch, tmp_path):
        monkeypatch.setenv("MAV_CHECKPOINT_PATH", str(tmp_path / "none"))
        pretrained.clear_cache()
        try:
            v = Validator(nn_config)
            v.dataset = nn_config.get_dataset()
            with pytest.raises(RuntimeError, match="checkpoint"):
                v.run_local_inference(v.dataset)
        finally:
            pretrained.clear_cache()

    def test_mocked_detections_iou_math(self, nn_config, monkeypatch):
        """IoU stats from a synthetic perfect detector: every frame's box
        equals the annotation -> iou_mean == 1.0."""
        v = Validator(nn_config)
        v.dataset = nn_config.get_dataset()

        def perfect(dataset, score_threshold=0.5):
            out = {}
            for i in range(dataset.N):
                r = dataset.get_annotation(i)[0]
                tl = r.get_topleft()
                out[str(i)] = [
                    f"drone 0.99 {tl[0]:.2f} {tl[1]:.2f} "
                    f"{r.size[0]:.2f} {r.size[1]:.2f}"]
            return out

        monkeypatch.setattr(v, "run_local_inference", perfect)
        stats = v.run_nn_validation()
        assert stats["iou_mean"] == pytest.approx(1.0, abs=1e-6)
        assert stats["detection_rate"] == 1.0
