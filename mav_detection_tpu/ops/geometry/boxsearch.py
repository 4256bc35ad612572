"""Window search ops: pyramid sliding-window scan + hill-climb refinement.

TPU-native reformulations of the reference's Python generators and unbounded
loops (``/root/reference/src/detector.py:280-358``, ``im_helpers.py:12-52``):

* ``analyze_pyramid`` — the scale-pyramid x sliding-window argmax. Each
  level's window scores are ONE box-filter (two banded matmuls) followed by a
  strided argmax — no window loop exists at runtime.
* ``optimize_window`` — the greedy +-1-px boundary hill climb becomes a
  ``lax.while_loop`` over an integral image: each candidate rectangle scores
  in O(1), the 8 candidate moves evaluate as a batch, and the loop carries a
  hard iteration cap (the reference's loop is unbounded).
* ``flow_history`` / ``blockshaped`` — temporal flow chaining and block
  pooling used by the warp-diff path.
"""
from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from mav_detection_tpu.ops.geometry.warp import remap_bilinear


class WindowResult(NamedTuple):
    score: jax.Array      # () best window sum
    box_xywh: jax.Array   # (4,) [x, y, w, h] in ORIGINAL image coordinates
    level: jax.Array      # () pyramid level index of the winner


def _integral(img: jax.Array) -> jax.Array:
    """Zero-padded 2-D inclusive prefix sums: ii[y, x] = sum(img[:y, :x])."""
    ii = jnp.cumsum(jnp.cumsum(img, axis=0), axis=1)
    return jnp.pad(ii, ((1, 0), (1, 0)))


def _rect_sum(ii: jax.Array, x0, y0, x1, y1) -> jax.Array:
    """Sum of img[y0:y1, x0:x1] from the padded integral image (O(1))."""
    return ii[y1, x1] - ii[y0, x1] - ii[y1, x0] + ii[y0, x0]


@functools.partial(jax.jit, static_argnames=("window", "step", "n_levels", "scale"))
def analyze_pyramid(img: jax.Array, window: int = 64, step: int = 16,
                    n_levels: int = 5, scale: float = 1.5) -> WindowResult:
    """Best ``window``x``window`` sum over a resize pyramid.

    Matches the reference's search semantics (64x64 window, step 16, scale
    1.5, stop below 30 px) with the level count made static.
    """
    h, w = img.shape[:2]
    x = img.astype(jnp.float32)
    if x.ndim == 3:
        x = x.sum(axis=-1)

    # reference init: result = (0, Rectangle((0,0),(0,0)), ...) with a strict
    # `<` comparison (detector.py:293,305) — an all-zero image keeps the
    # empty box
    best_score = jnp.float32(0.0)
    best_box = jnp.zeros(4, jnp.float32)
    best_level = jnp.int32(0)

    for lvl in range(n_levels):
        factor = scale ** lvl
        lh, lw = int(round(h / factor)), int(round(w / factor))
        if lh < 30 or lw < 30:
            break
        lev = jax.image.resize(x, (lh, lw), "linear") if lvl else x
        ii = _integral(lev)
        ny = max((lh - window) // step + 1, 0)
        nx = max((lw - window) // step + 1, 0)
        if ny == 0 or nx == 0:
            # level smaller than the window contributes nothing: the
            # reference skips every partial window (im_helpers.py:52,
            # detector.py:297-298), so scoring a clipped region here would
            # report a box larger than the image that was never scored
            continue
        ys = jnp.arange(ny) * step
        xs = jnp.arange(nx) * step
        yy, xx = jnp.meshgrid(ys, xs, indexing="ij")
        scores = _rect_sum(ii, xx, yy, xx + window, yy + window)
        flat = scores.reshape(-1)
        am = jnp.argmax(flat)
        sc = flat[am]
        wy = (am // nx) * step
        wx = (am % nx) * step
        better = sc > best_score
        box = jnp.stack([wx * factor, wy * factor,
                         jnp.float32(window * factor),
                         jnp.float32(window * factor)])
        best_box = jnp.where(better, box.astype(jnp.float32), best_box)
        best_level = jnp.where(better, lvl, best_level)
        best_score = jnp.maximum(best_score, sc)

    return WindowResult(score=best_score, box_xywh=best_box, level=best_level)


@functools.partial(jax.jit, static_argnames=("max_iters",))
def optimize_window(mag_img: jax.Array, box_xywh: jax.Array,
                    max_iters: int = 256) -> Tuple[jax.Array, jax.Array]:
    """Greedy hill climb of box boundaries maximizing the enclosed sum.

    Reference semantics (``detector.py:314-358``): move the top-left OR the
    bottom-right corner by (+-1, +-1); take the best improving move; stop when
    no move improves — with an explicit iteration cap instead of ``while True``.
    Returns (score, refined box [x, y, w, h]).
    """
    h, w = mag_img.shape[:2]
    img = mag_img.astype(jnp.float32)
    if img.ndim == 3:
        img = img.sum(axis=-1)
    ii = _integral(img)

    def score(box):
        x0 = jnp.clip(box[0], 0, w).astype(jnp.int32)
        y0 = jnp.clip(box[1], 0, h).astype(jnp.int32)
        x1 = jnp.clip(box[0] + box[2], 0, w).astype(jnp.int32)
        y1 = jnp.clip(box[1] + box[3], 0, h).astype(jnp.int32)
        empty = (x1 <= x0) | (y1 <= y0)
        return jnp.where(empty, 0.0,
                         _rect_sum(ii, x0, y0, jnp.maximum(x1, x0),
                                   jnp.maximum(y1, y0)))

    # candidate moves: corner (0=topleft, 1=bottomright) x di x dj
    moves = []
    for corner in (0, 1):
        for di in (-1, 1):
            for dj in (-1, 1):
                if corner == 0:
                    moves.append((di, dj, 0.0 - di, 0.0 - dj))  # x,y shift; w,h compensate
                else:
                    moves.append((0.0, 0.0, di, dj))
    moves = jnp.asarray(moves, jnp.float32)  # (8, 4) deltas on [x, y, w, h]

    def body(state):
        box, cur, _ = state
        cands = box[None, :] + moves
        scores = jax.vmap(score)(cands)
        best = jnp.argmax(scores)
        improved = scores[best] > cur
        new_box = jnp.where(improved, cands[best], box)
        new_score = jnp.where(improved, scores[best], cur)
        return new_box, new_score, improved

    init = (box_xywh.astype(jnp.float32), score(box_xywh.astype(jnp.float32)),
            jnp.bool_(True))

    def capped_body(i, state):
        return jax.lax.cond(state[2], lambda s: body(s), lambda s: s, state)

    box, sc, _ = jax.lax.fori_loop(0, max_iters, capped_body, init)
    return sc, box


class FlowHistory(NamedTuple):
    """Ring buffer of flow fields with chained-warp accumulation
    (reference ``detector.py:365-388``)."""
    buffer: jax.Array  # (length, h, w, 2)
    index: jax.Array   # () next write slot


def make_flow_history(length: int, h: int, w: int) -> FlowHistory:
    return FlowHistory(buffer=jnp.zeros((length, h, w, 2), jnp.float32),
                       index=jnp.int32(0))


@jax.jit
def push_flow(history: FlowHistory, flow: jax.Array) -> FlowHistory:
    buf = jax.lax.dynamic_update_index_in_dim(
        history.buffer, flow.astype(jnp.float32), history.index, 0)
    return FlowHistory(buffer=buf,
                       index=(history.index + 1) % history.buffer.shape[0])


@jax.jit
def accumulated_flow(history: FlowHistory) -> jax.Array:
    """Chain the buffered flows by successive warping: each step looks up the
    next field at the currently accumulated position."""
    length, h, w = history.buffer.shape[:3]
    xs = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
    ys = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)

    def step(k, acc):
        slot = (history.index + k) % length
        field = history.buffer[slot]
        fx = remap_bilinear(field[..., 0], xs + acc[..., 0], ys + acc[..., 1])
        fy = remap_bilinear(field[..., 1], xs + acc[..., 0], ys + acc[..., 1])
        return acc + jnp.stack([fx, fy], axis=-1)

    init = jnp.zeros((h, w, 2), jnp.float32)
    return jax.lax.fori_loop(0, length, step, init)


def blockshaped(arr: jax.Array, nrows: int, ncols: int) -> jax.Array:
    """(h, w) -> (n, nrows, ncols) tiling (reference ``utils.py:260-275``)."""
    h, w = arr.shape
    assert h % nrows == 0 and w % ncols == 0, f"{h}x{w} not divisible by {nrows}x{ncols}"
    return (arr.reshape(h // nrows, nrows, -1, ncols)
            .swapaxes(1, 2)
            .reshape(-1, nrows, ncols))
