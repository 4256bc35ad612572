"""Single-class YOLO-style detector head, replacing the remote YOLOv4
inference sidecar (``/root/reference/src/validator.py:61-93``).

Tiny anchor-based single-scale head (the targets are small MAVs on mostly
uniform backgrounds): conv backbone at 1/16 resolution, per-cell predictions
of (objectness, cx, cy, w, h) for 3 anchors, decoded + top-k selected on
device (fixed shapes — no dynamic NMS; greedy IoU suppression over the top-K
candidates runs as a small fori_loop like the corner selector).
"""
from __future__ import annotations

import functools
from typing import Any, NamedTuple, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

ANCHORS = np.array([[12.0, 12.0], [24.0, 24.0], [48.0, 48.0]], np.float32)
MAX_DETECTIONS = 16


class Boxes(NamedTuple):
    xywh: jax.Array   # (MAX_DETECTIONS, 4) center-format pixels
    score: jax.Array  # (MAX_DETECTIONS,)
    valid: jax.Array  # (MAX_DETECTIONS,) bool


class TinyYOLO(nn.Module):
    base: int = 24
    n_anchors: int = 3
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        """(h, w, 3) -> (h/16, w/16, anchors*5) raw predictions."""
        x = x.astype(jnp.float32) / 127.5 - 1.0
        for i, feats in enumerate([self.base, self.base * 2, self.base * 4,
                                   self.base * 8]):
            x = nn.Conv(feats, (3, 3), strides=(2, 2), dtype=self.dtype)(x)
            x = nn.relu(nn.GroupNorm(num_groups=8, dtype=self.dtype)(x))
            x = nn.Conv(feats, (3, 3), dtype=self.dtype)(x)
            x = nn.relu(nn.GroupNorm(num_groups=8, dtype=self.dtype)(x))
        return nn.Conv(self.n_anchors * 5, (1, 1), dtype=jnp.float32)(x)


def decode_predictions(raw: jax.Array, stride: int = 16,
                       score_threshold: float = 0.5,
                       iou_threshold: float = 0.45) -> Boxes:
    """Raw grid predictions -> top-K boxes with greedy IoU suppression."""
    gh, gw = raw.shape[:2]
    na = ANCHORS.shape[0]
    p = raw.reshape(gh, gw, na, 5)
    ys = jax.lax.broadcasted_iota(jnp.float32, (gh, gw), 0)
    xs = jax.lax.broadcasted_iota(jnp.float32, (gh, gw), 1)
    cx = (jax.nn.sigmoid(p[..., 1]) + xs[..., None]) * stride
    cy = (jax.nn.sigmoid(p[..., 2]) + ys[..., None]) * stride
    anchors = jnp.asarray(ANCHORS)
    bw = jnp.exp(jnp.clip(p[..., 3], -4, 4)) * anchors[None, None, :, 0]
    bh = jnp.exp(jnp.clip(p[..., 4], -4, 4)) * anchors[None, None, :, 1]
    score = jax.nn.sigmoid(p[..., 0])

    flat_score = score.reshape(-1)
    k = min(MAX_DETECTIONS * 4, flat_score.shape[0])
    top_scores, idx = jax.lax.top_k(flat_score, k)
    boxes = jnp.stack([cx.reshape(-1)[idx], cy.reshape(-1)[idx],
                       bw.reshape(-1)[idx], bh.reshape(-1)[idx]], axis=-1)
    cand_ok = top_scores > score_threshold

    def iou(a, b):
        ax1, ay1 = a[..., 0] - a[..., 2] / 2, a[..., 1] - a[..., 3] / 2
        ax2, ay2 = a[..., 0] + a[..., 2] / 2, a[..., 1] + a[..., 3] / 2
        bx1, by1 = b[..., 0] - b[..., 2] / 2, b[..., 1] - b[..., 3] / 2
        bx2, by2 = b[..., 0] + b[..., 2] / 2, b[..., 1] + b[..., 3] / 2
        ix = jnp.maximum(0.0, jnp.minimum(ax2, bx2) - jnp.maximum(ax1, bx1))
        iy = jnp.maximum(0.0, jnp.minimum(ay2, by2) - jnp.maximum(ay1, by1))
        inter = ix * iy
        union = (a[..., 2] * a[..., 3] + b[..., 2] * b[..., 3] - inter)
        return inter / jnp.maximum(union, 1e-9)

    def greedy(i, state):
        keep, count = state
        overlaps = iou(boxes, boxes[i])
        conflict = jnp.any(keep & (overlaps > iou_threshold)
                           & (jnp.arange(k) != i))
        take = cand_ok[i] & ~conflict & (count < MAX_DETECTIONS)
        return keep.at[i].set(take), count + take.astype(jnp.int32)

    keep, _ = jax.lax.fori_loop(0, k, greedy,
                                (jnp.zeros(k, bool), jnp.int32(0)))
    order = jnp.argsort(~keep, stable=True)[:MAX_DETECTIONS]
    return Boxes(xywh=boxes[order], score=top_scores[order], valid=keep[order])


def create_yolo(key: jax.Array = None, image_hw: Tuple[int, int] = (480, 752)):
    if key is None:
        key = jax.random.PRNGKey(0)
    model = TinyYOLO()
    h = image_hw[0] + (-image_hw[0]) % 16
    w = image_hw[1] + (-image_hw[1]) % 16
    params = model.init(key, jnp.zeros((h, w, 3), jnp.float32))
    return model, params


@functools.partial(jax.jit, static_argnames=())
def _yolo_apply(params, img):
    return TinyYOLO().apply(params, img)


def detect_boxes(params, image: jax.Array,
                 score_threshold: float = 0.5) -> Boxes:
    """(h, w, 3) -> Boxes; pads to /16."""
    h, w = image.shape[:2]
    ph = (-h) % 16
    pw = (-w) % 16
    if ph or pw:
        image = jnp.pad(image, ((0, ph), (0, pw), (0, 0)), mode="edge")
    raw = _yolo_apply(params, image)
    return decode_predictions(raw, score_threshold=score_threshold)


def yolo_loss(params, model: TinyYOLO, image, target_xywh, stride: int = 16):
    """Single-target loss: objectness BCE on the best-matching anchor cell +
    coordinate regression (trains on the synthetic fixture's single drone)."""
    raw = model.apply(params, image)
    gh, gw = raw.shape[:2]
    na = ANCHORS.shape[0]
    p = raw.reshape(gh, gw, na, 5)

    cx, cy, bw, bh = target_xywh
    gx = jnp.clip(cx / stride, 0, gw - 1 - 1e-3)
    gy = jnp.clip(cy / stride, 0, gh - 1 - 1e-3)
    ci = gx.astype(jnp.int32)
    cj = gy.astype(jnp.int32)
    anchors = jnp.asarray(ANCHORS)
    a = jnp.argmin(jnp.abs(anchors[:, 0] * anchors[:, 1] - bw * bh))

    obj_target = jnp.zeros((gh, gw, na)).at[cj, ci, a].set(1.0)
    obj_logit = p[..., 0]
    obj_loss = jnp.mean(
        jnp.maximum(obj_logit, 0) - obj_logit * obj_target
        + jnp.log1p(jnp.exp(-jnp.abs(obj_logit))))

    pred = p[cj, ci, a]
    tx = gx - ci
    ty = gy - cj
    coord_loss = ((jax.nn.sigmoid(pred[1]) - tx) ** 2
                  + (jax.nn.sigmoid(pred[2]) - ty) ** 2
                  + (pred[3] - jnp.log(jnp.maximum(bw / anchors[a, 0], 1e-4))) ** 2
                  + (pred[4] - jnp.log(jnp.maximum(bh / anchors[a, 1], 1e-4))) ** 2)
    return obj_loss * 100.0 + coord_loss
