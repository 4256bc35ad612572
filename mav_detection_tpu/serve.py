"""TPU-backed TinyYOLO inference server — the reference's YOLOv4 REST
sidecar, in-repo.

The reference validated NN detection modes against an *external* YOLOv4
HTTP server (client contract at ``/root/reference/src/validator.py:61-93``);
the server itself was never part of the repo, so switching machines meant
standing up a separate CUDA container. Here the same REST protocol is served
by the on-device TinyYOLO head, so the existing client
(:meth:`mav_detection_tpu.eval.validator.Validator.get_inference`) talks to
our own stack — detection can run on a TPU host while validation runs
anywhere:

  GET  /config              -> {"start_time": <server start epoch>,
                                "media": ["npz", "video"]}
                               (the client keys its content-hash cache on
                               start_time, validator.py:66-69; "media" lets
                               it negotiate the upload container — absent on
                               a reference-era sidecar, which gets mp4)
  POST /predict_video       -> multipart field ``video``; query param
                               ``use_default_weights`` selects the RGB
                               fallback checkpoint; responds with the
                               annotated media bytes
  GET  /predict_video_boxes -> {"<frame>": ["name conf x y w h", ...]}
                               (top-left pixel coords, the box-string
                               protocol ``parse_frames`` consumes).
                               Optional ``?hash=<sha1-of-media>`` returns
                               the boxes for THAT job, making a concurrent
                               POST-then-GET pair race-free; without it the
                               last-finished job's boxes are returned (the
                               reference sidecar's behavior).

Media handling: ``.npz`` archives (key ``frames``: (N, H, W, 3) uint8) are
first-class — the hermetic test path ships frames directly.  Anything else
is handed to ``cv2.VideoCapture`` and fails gracefully when no codec
exists.  Annotated output mirrors the input container: npz in -> npz of
frames with boxes burned in; video in -> mp4 (cv2.VideoWriter) with an npz
fallback when no encoder is available.

Inference is batched on device: frames run through ``jax.vmap`` of the
fixed-shape detector in chunks of ``batch`` (default 8, the product batch),
with edge-padding of the ragged tail — one compiled program regardless of
sequence length.
"""
from __future__ import annotations

import hashlib
import io
import json
import logging
import threading
import time
from collections import OrderedDict
from email.parser import BytesParser
from email.policy import HTTP as HTTP_POLICY
from functools import partial
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Dict, List, Optional, Tuple
from urllib.parse import parse_qs, urlparse

import numpy as np

logger = logging.getLogger(__name__)


def _decode_media(data: bytes) -> Tuple[np.ndarray, str]:
    """Media bytes -> ((N, H, W, 3) uint8 frames, container kind)."""
    if data[:4] == b"PK\x03\x04":  # npz is a zip archive
        with np.load(io.BytesIO(data)) as z:
            if "frames" not in z:
                raise ValueError("npz media must carry a 'frames' array")
            frames = np.asarray(z["frames"], np.uint8)
        if frames.ndim != 4 or frames.shape[-1] != 3:
            raise ValueError(f"bad frames shape {frames.shape}")
        return frames, "npz"
    # fall back to OpenCV video decode (gated: no codec in this image)
    import tempfile

    import cv2

    with tempfile.NamedTemporaryFile(suffix=".mp4") as f:
        f.write(data)
        f.flush()
        cap = cv2.VideoCapture(f.name)
        frames_l: List[np.ndarray] = []
        while True:
            ok, frame = cap.read()
            if not ok:
                break
            frames_l.append(frame)
        cap.release()
    if not frames_l:
        raise ValueError("could not decode media: not an npz and "
                         "cv2.VideoCapture produced no frames (no codec?)")
    return np.stack(frames_l), "video"


def _encode_annotated(frames: np.ndarray,
                      boxes: Dict[str, List[str]], kind: str) -> bytes:
    """Burn the detected boxes into the frames; return container bytes
    mirroring the input kind ("npz" or "video"; video falls back to npz
    when cv2 has no mp4 encoder)."""
    import cv2

    out = frames.copy()
    for i in range(len(out)):
        for s in boxes.get(str(i), []):
            parts = s.split(" ")
            x, y, w, h = (float(v) for v in parts[2:6])
            cv2.rectangle(out[i], (int(x), int(y)),
                          (int(x + w), int(y + h)), (0, 0, 255), 1)
    if kind == "video":
        import tempfile

        h_px, w_px = out.shape[1:3]
        with tempfile.NamedTemporaryFile(suffix=".mp4") as f:
            writer = cv2.VideoWriter(f.name,
                                     cv2.VideoWriter_fourcc(*"mp4v"),
                                     30, (w_px, h_px))
            if writer.isOpened():
                for frame in out:
                    writer.write(frame)
                writer.release()
                with open(f.name, "rb") as rf:
                    return rf.read()
            logger.warning("no cv2 mp4 encoder; annotated output is npz")
    buf = io.BytesIO()
    np.savez_compressed(buf, frames=out)
    return buf.getvalue()


class YoloInferenceEngine:
    """Batched on-device TinyYOLO over frame stacks.

    One vmapped program per (batch, H, W) shape; the ragged tail is
    edge-padded to the batch size so long sequences reuse one executable.
    """

    def __init__(self, mode: Optional[str] = None, batch: int = 8,
                 score_threshold: float = 0.5):
        from mav_detection_tpu.models import pretrained

        self.batch = int(batch)
        self.score_threshold = float(score_threshold)
        self._params = pretrained.load_yolo_params(mode)
        self._default_params = (pretrained.load_yolo_params(None)
                                if mode else self._params)
        if self._params is None:
            raise RuntimeError(
                "no TinyYOLO checkpoint shipped — train one with "
                "`python -m mav_detection_tpu.cli.train --model yolo`")

    def predict(self, frames: np.ndarray,
                use_default_weights: bool = False) -> Dict[str, List[str]]:
        import jax
        import jax.numpy as jnp

        from mav_detection_tpu.models.yolo import detect_boxes

        params = (self._default_params if use_default_weights
                  else self._params)
        thr = self.score_threshold
        run = jax.vmap(partial(detect_boxes, params,
                               score_threshold=thr))
        n = len(frames)
        result: Dict[str, List[str]] = {}
        for b0 in range(0, n, self.batch):
            chunk = frames[b0:b0 + self.batch]
            pad = self.batch - len(chunk)
            if pad:  # edge-pad the tail: same shape -> same executable
                chunk = np.concatenate(
                    [chunk, np.repeat(chunk[-1:], pad, axis=0)])
            boxes = run(jnp.asarray(chunk, jnp.float32))
            valid = np.asarray(boxes.valid)
            xywh = np.asarray(boxes.xywh)
            score = np.asarray(boxes.score)
            for j in range(len(chunk) - pad):
                strings = []
                for k in range(valid.shape[1]):
                    if not valid[j, k]:
                        continue
                    cx, cy, bw, bh = xywh[j, k]
                    strings.append(
                        f"drone {score[j, k]:.4f} {cx - bw / 2:.2f} "
                        f"{cy - bh / 2:.2f} {bw:.2f} {bh:.2f}")
                result[str(b0 + j)] = strings
        return result


class YoloServer(ThreadingHTTPServer):
    """ThreadingHTTPServer carrying engine + last-job state."""

    daemon_threads = True

    MAX_JOBS = 64  # bound on retained per-hash results

    def __init__(self, addr, engine: YoloInferenceEngine):
        super().__init__(addr, _Handler)
        self.engine = engine
        self.start_time = time.time()
        self.last_boxes: Dict[str, List[str]] = {}
        # content-sha1 -> boxes, insertion-ordered for LRU eviction: lets a
        # client's POST-then-GET pair survive interleaved concurrent jobs
        self.boxes_by_hash: "OrderedDict[str, Dict[str, List[str]]]" = \
            OrderedDict()
        self._lock = threading.Lock()

    def store_boxes(self, digest: str, boxes: Dict[str, List[str]]) -> None:
        with self._lock:
            self.last_boxes = boxes
            self.boxes_by_hash.pop(digest, None)
            self.boxes_by_hash[digest] = boxes
            while len(self.boxes_by_hash) > self.MAX_JOBS:
                self.boxes_by_hash.popitem(last=False)


class _Handler(BaseHTTPRequestHandler):
    server: YoloServer

    def log_message(self, fmt, *args):  # route through logging, not stderr
        logger.debug("serve: " + fmt % args)

    def _json(self, obj, code: int = 200) -> None:
        body = json.dumps(obj).encode()
        self.send_response(code)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def do_GET(self) -> None:
        path = urlparse(self.path).path
        if path == "/config":
            # "media" advertises container support; a reference-era YOLOv4
            # sidecar returns only start_time, and the validator then posts
            # mp4 as that server expects (validator.py:75-83 in the ref)
            self._json({"start_time": self.server.start_time,
                        "media": ["npz", "video"]})
        elif path == "/predict_video_boxes":
            digest = parse_qs(urlparse(self.path).query).get("hash", [None])[0]
            # snapshot under the lock, write to the socket OUTSIDE it — a
            # stalled client reader must not block every other handler
            with self.server._lock:
                if digest is None:  # reference-sidecar behavior: last job
                    boxes = dict(self.server.last_boxes)
                else:
                    boxes = self.server.boxes_by_hash.get(digest)
                    boxes = dict(boxes) if boxes is not None else None
            if boxes is not None:
                self._json(boxes)
            else:
                self._json({"error": f"unknown job hash {digest}"}, 404)
        elif path == "/health":
            self._json({"ok": True})
        else:
            self._json({"error": f"unknown path {path}"}, 404)

    def do_POST(self) -> None:
        parsed = urlparse(self.path)
        if parsed.path != "/predict_video":
            self._json({"error": f"unknown path {parsed.path}"}, 404)
            return
        try:
            length = int(self.headers.get("Content-Length", "0"))
            body = self.rfile.read(length)
            media = self._multipart_field(body, "video")
            if media is None:
                raise ValueError("multipart field 'video' missing")
            q = parse_qs(parsed.query)
            use_default = q.get("use_default_weights",
                                ["False"])[0].lower() in ("true", "1")
            frames, kind = _decode_media(media)
            boxes = self.server.engine.predict(
                frames, use_default_weights=use_default)
            self.server.store_boxes(hashlib.sha1(media).hexdigest(), boxes)
            out = _encode_annotated(frames, boxes, kind)
            self.send_response(200)
            self.send_header("Content-Type", "application/octet-stream")
            self.send_header("Content-Length", str(len(out)))
            self.end_headers()
            self.wfile.write(out)
        except Exception as e:  # surface decode/infer errors to the client
            logger.exception("predict_video failed")
            self._json({"error": str(e)}, 400)

    def _multipart_field(self, body: bytes, name: str) -> Optional[bytes]:
        ctype = self.headers.get("Content-Type", "")
        msg = BytesParser(policy=HTTP_POLICY).parsebytes(
            b"Content-Type: " + ctype.encode() + b"\r\n\r\n" + body)
        for part in msg.iter_parts():
            if part.get_param("name", header="Content-Disposition") == name:
                return part.get_payload(decode=True)
        return None


def create_server(port: int = 0, host: str = "127.0.0.1",
                  mode: Optional[str] = None, batch: int = 8,
                  score_threshold: float = 0.5) -> YoloServer:
    """Build a server bound to ``host:port`` (0 = ephemeral; read
    ``server.server_address[1]``). Call ``serve_forever()`` to run."""
    engine = YoloInferenceEngine(mode=mode, batch=batch,
                                 score_threshold=score_threshold)
    return YoloServer((host, port), engine)
