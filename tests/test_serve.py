"""Client <-> server loop for the in-repo TinyYOLO REST sidecar.

The reference validated NN modes against an external YOLOv4 HTTP server
(client at ``/root/reference/src/validator.py:61-93``); here the same
protocol is served by :mod:`mav_detection_tpu.serve`, so the shipped client
talks to our own on-device stack. These tests run the REAL client
(``Validator.get_inference`` via requests) against a live in-process server.
"""
import json
import threading

import numpy as np
import pytest

from mav_detection_tpu.core.config import RunConfig
from mav_detection_tpu.data.synthetic import SyntheticDataset, SyntheticParams
from mav_detection_tpu.eval.validator import Validator
from mav_detection_tpu.serve import YoloInferenceEngine, create_server

SMALL = SyntheticParams(height=120, width=160, n_frames=8)


@pytest.fixture(scope="module")
def server_url():
    server = create_server(port=0)
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    host, port = server.server_address
    yield f"http://{host}:{port}"
    server.shutdown()


@pytest.fixture(scope="module")
def frames():
    ds = SyntheticDataset(params=SMALL)
    return np.stack([np.asarray(ds.get_frame(i)) for i in range(4)])


class TestServeProtocol:
    def test_config_endpoint(self, server_url):
        import requests

        cfg = requests.get(f"{server_url}/config").json()
        assert "start_time" in cfg and float(cfg["start_time"]) > 0

    @pytest.mark.slow
    def test_client_roundtrip_matches_direct_inference(
            self, server_url, frames, tmp_path):
        """The shipped HTTP client against our server returns the same box
        strings as calling the engine directly."""
        media = tmp_path / "video.npz"
        np.savez(media, frames=frames)

        cfg = RunConfig(dataset="synthetic", mode="FLOW_FOE_YOLO",
                        headless=True)
        v = Validator(cfg, host=server_url)
        boxes = v.get_inference(str(media), str(tmp_path / "out.npz"))
        assert set(boxes.keys()) == {str(i) for i in range(len(frames))}

        direct = YoloInferenceEngine().predict(frames)
        assert boxes == direct

        # parse through the shipped box-string parser
        parsed = Validator.parse_frames(boxes)
        assert set(parsed.keys()) == set(range(len(frames)))

        # annotated media mirrors the input container and shape
        with np.load(tmp_path / "out.npz") as z:
            assert z["frames"].shape == frames.shape

        # second call is served from the content-hash cache (reference
        # validator.py:66-69 idiom): cached JSON exists and matches
        cached = v.get_inference(str(media), str(tmp_path / "out.npz"))
        assert cached == boxes
        cache_files = list((tmp_path / "bounding-boxes").glob("*.json"))
        assert cache_files, "content-hash cache file not written"
        assert json.loads(cache_files[0].read_text()) == boxes

    def test_use_default_weights_param(self, server_url, frames, tmp_path):
        """use_default_weights=True selects the RGB fallback checkpoint
        (same weights as mode=None here, so the call must succeed and
        return every frame key)."""
        import requests

        media = tmp_path / "v.npz"
        np.savez(media, frames=frames[:2])
        with open(media, "rb") as fh:
            r = requests.post(f"{server_url}/predict_video",
                              params=(("use_default_weights", True),),
                              files={"video": ("v.npz", fh)})
        assert r.status_code == 200
        boxes = requests.get(f"{server_url}/predict_video_boxes").json()
        assert set(boxes.keys()) == {"0", "1"}

    def test_bad_media_is_a_client_error(self, server_url):
        import requests

        r = requests.post(f"{server_url}/predict_video",
                          files={"video": ("x.bin", b"not media")})
        assert r.status_code == 400
        assert "error" in r.json()

    def test_video_in_video_out(self, server_url, frames, tmp_path):
        """mp4 in -> annotated mp4 back (the reference sidecar's contract);
        the npz container stays the codec-free first-class path."""
        import cv2
        import requests

        path = tmp_path / "in.mp4"
        h, w = frames.shape[1:3]
        wr = cv2.VideoWriter(str(path), cv2.VideoWriter_fourcc(*"mp4v"),
                             30, (w, h))
        if not wr.isOpened():
            pytest.skip("no cv2 mp4 codec in this image")
        for f in frames[:2]:
            wr.write(np.ascontiguousarray(f))
        wr.release()

        r = requests.post(f"{server_url}/predict_video",
                          files={"video": ("in.mp4", path.read_bytes())})
        assert r.status_code == 200
        out = tmp_path / "out.mp4"
        out.write_bytes(r.content)
        assert r.content[:4] != b"PK\x03\x04", "expected mp4, got npz bytes"
        cap = cv2.VideoCapture(str(out))
        ok, fr = cap.read()
        cap.release()
        assert ok and fr.shape == frames.shape[1:]

    def test_hash_keyed_boxes_survive_interleaved_jobs(self, server_url,
                                                       frames, tmp_path):
        """A POST-then-GET pair is race-free when the GET carries the media
        hash: another job finishing in between must not swap the boxes."""
        import hashlib

        import requests

        def npz_bytes(stack):
            import io

            buf = io.BytesIO()
            np.savez(buf, frames=stack)
            return buf.getvalue()

        job_a, job_b = npz_bytes(frames[:2]), npz_bytes(frames[1:3])
        ra = requests.post(f"{server_url}/predict_video",
                           files={"video": ("a.npz", job_a)})
        rb = requests.post(f"{server_url}/predict_video",
                           files={"video": ("b.npz", job_b)})
        assert ra.status_code == rb.status_code == 200

        ha = hashlib.sha1(job_a).hexdigest()
        boxes_a = requests.get(f"{server_url}/predict_video_boxes",
                               params={"hash": ha}).json()
        assert boxes_a == YoloInferenceEngine().predict(frames[:2])
        # no hash -> reference behavior: whichever job finished last
        last = requests.get(f"{server_url}/predict_video_boxes").json()
        assert last == YoloInferenceEngine().predict(frames[1:3])
        # unknown hash is a 404, not someone else's boxes
        r = requests.get(f"{server_url}/predict_video_boxes",
                         params={"hash": "0" * 40})
        assert r.status_code == 404


class TestRemoteValidationLoop:
    def test_processor_to_server_to_stats(self, server_url, tmp_path,
                                          monkeypatch):
        """The reference's full remote-NN loop, hermetic: the Processor
        writes the processed sequence plus a codec-free ``video.npz``; the
        Validator's remote branch (YOLO_INFERENCE_HOST) renders the
        mode-appropriate inference imagery, posts it to the live server
        through the shipped requests client, and produces IoU stats — the
        workflow the reference needed an external CUDA container for."""
        from mav_detection_tpu.pipeline.processor import Processor

        monkeypatch.chdir(tmp_path)
        cfg = RunConfig(dataset="synthetic", mode="FLOW_FOE_YOLO",
                        flow_source="GROUND_TRUTH", headless=True)
        cfg.get_dataset = lambda: SyntheticDataset(
            params=SMALL, materialize_to=str(tmp_path))
        proc = Processor(cfg)
        proc.run_detection()
        ds = cfg.get_dataset()
        npz = f"{ds.seq_path}/video.npz"
        import os
        assert os.path.exists(npz), "processor did not write video.npz"

        monkeypatch.setenv("YOLO_INFERENCE_HOST", server_url)
        v = Validator(cfg, host=server_url)
        v.dataset = ds
        stats = v.run_nn_validation()
        assert "iou_mean" in stats
        # the server scored mode-appropriate imagery (ALL N frames), not
        # the detector's processed/ overlay frames (N-1 of them)
        nn_input = f"{ds.seq_path}/nn-input-flow_foe_yolo.npz"
        assert os.path.exists(nn_input), "mode imagery npz not built"
        with np.load(nn_input) as z:
            assert len(z["frames"]) == ds.N
        with np.load(npz) as z:
            assert len(z["frames"]) == ds.N - 1  # overlays: one per pair
        # annotated media came back from the server
        assert os.path.exists(nn_input.replace(".npz", "-out.npz"))


class TestConcurrency:
    def test_parallel_predict_requests(self, server_url, frames, tmp_path):
        """ThreadingHTTPServer handles concurrent /predict_video posts: JAX
        inference is called from several handler threads at once; every
        response must be complete and correct (the box strings for a frame
        stack depend only on its content)."""
        import requests

        media = tmp_path / "cc.npz"
        np.savez(media, frames=frames[:2])
        payload = media.read_bytes()
        results = [None] * 4

        def post(i):
            r = requests.post(f"{server_url}/predict_video",
                              files={"video": ("cc.npz", payload)})
            results[i] = r.status_code

        ts = [threading.Thread(target=post, args=(i,)) for i in range(4)]
        for t in ts:
            t.start()
        for t in ts:
            t.join(timeout=600)
        assert results == [200] * 4
        boxes = requests.get(f"{server_url}/predict_video_boxes").json()
        assert set(boxes.keys()) == {"0", "1"}
        assert boxes == YoloInferenceEngine().predict(frames[:2])


class TestEngine:
    def test_ragged_tail_padding(self, frames):
        """n % batch != 0: the tail chunk edge-pads to one executable and
        the padded frames do NOT appear in the result."""
        eng = YoloInferenceEngine(batch=8)
        out = eng.predict(frames[:3])
        assert set(out.keys()) == {"0", "1", "2"}

    def test_batched_equals_single(self, frames):
        """Batched (vmapped) inference produces the identical box strings
        as batch=1 — the chunking is pure orchestration."""
        a = YoloInferenceEngine(batch=8).predict(frames)
        b = YoloInferenceEngine(batch=1).predict(frames)
        assert a == b
