"""Bilinear image warps (remap / affine / perspective) on device.

TPU equivalents of ``cv2.remap`` / ``cv2.warpAffine`` / ``cv2.warpPerspective``
used by the reference's flow-history chaining and warp-diff paths
(``/root/reference/src/detector.py:204-240,365-388``). cv2 semantics: the
given matrix is the FORWARD transform; each destination pixel samples the
source at M^-1 (dst), out-of-range samples read 0 (BORDER_CONSTANT).
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


@jax.jit
def remap_bilinear(img: jax.Array, map_x: jax.Array, map_y: jax.Array) -> jax.Array:
    """Sample ``img`` at float coords (map_x, map_y).

    BORDER_CONSTANT(0) semantics per *tap* like cv2: a sample straddling the
    border mixes in zeros for the out-of-range neighbors instead of zeroing
    the whole output pixel.
    """
    h, w = img.shape[0], img.shape[1]
    x0 = jnp.floor(map_x)
    y0 = jnp.floor(map_y)
    fx = map_x - x0
    fy = map_y - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    expand = (...,) + (None,) * (img.ndim - 2)

    def tap(yy, xx, wgt):
        ok = (xx >= 0) & (xx < w) & (yy >= 0) & (yy < h)
        g = img[jnp.clip(yy, 0, h - 1), jnp.clip(xx, 0, w - 1)]
        return (wgt * ok.astype(wgt.dtype))[expand] * g

    out = (
        tap(y0i, x0i, (1 - fx) * (1 - fy))
        + tap(y0i, x0i + 1, fx * (1 - fy))
        + tap(y0i + 1, x0i, (1 - fx) * fy)
        + tap(y0i + 1, x0i + 1, fx * fy)
    )
    return out.astype(img.dtype)


def sample_bilinear_replicate(fmap: jax.Array, cx: jax.Array,
                              cy: jax.Array) -> jax.Array:
    """Clamped bilinear sampling of (h, w[, c]) at float coords with
    REPLICATE borders — the shared sampler for feature/texture lookups
    (RAFT correlation taps, synthetic-scene warps). ``remap_bilinear``
    above keeps cv2's BORDER_CONSTANT parity instead; they are distinct
    border contracts, not duplicates."""
    h, w = fmap.shape[:2]
    x0 = jnp.floor(cx)
    y0 = jnp.floor(cy)
    fx = cx - x0
    fy = cy - y0
    x0i = jnp.clip(x0, 0, w - 1).astype(jnp.int32)
    y0i = jnp.clip(y0, 0, h - 1).astype(jnp.int32)
    x1i = jnp.minimum(x0i + 1, w - 1)
    y1i = jnp.minimum(y0i + 1, h - 1)
    if fmap.ndim == 3:
        fx = fx[..., None]
        fy = fy[..., None]
    return ((1 - fx) * (1 - fy) * fmap[y0i, x0i]
            + fx * (1 - fy) * fmap[y0i, x1i]
            + (1 - fx) * fy * fmap[y1i, x0i]
            + fx * fy * fmap[y1i, x1i])


def _dst_grid(out_hw: Tuple[int, int], dtype=jnp.float32):
    h, w = out_hw
    xs = jax.lax.broadcasted_iota(dtype, (h, w), 1)
    ys = jax.lax.broadcasted_iota(dtype, (h, w), 0)
    return xs, ys


def warp_affine(img: jax.Array, M: jax.Array,
                out_hw: Optional[Tuple[int, int]] = None) -> jax.Array:
    """cv2.warpAffine parity: M is 2x3 forward; sample src at M^-1(dst)."""
    if out_hw is None:
        out_hw = (img.shape[0], img.shape[1])
    M3 = jnp.concatenate([M, jnp.array([[0.0, 0.0, 1.0]], M.dtype)], axis=0)
    Minv = jnp.linalg.inv(M3)
    xs, ys = _dst_grid(out_hw)
    sx = Minv[0, 0] * xs + Minv[0, 1] * ys + Minv[0, 2]
    sy = Minv[1, 0] * xs + Minv[1, 1] * ys + Minv[1, 2]
    return remap_bilinear(img, sx, sy)


def warp_perspective(img: jax.Array, H: jax.Array,
                     out_hw: Optional[Tuple[int, int]] = None) -> jax.Array:
    """cv2.warpPerspective parity: H is 3x3 forward; inverse-map and divide."""
    if out_hw is None:
        out_hw = (img.shape[0], img.shape[1])
    Hinv = jnp.linalg.inv(H)
    xs, ys = _dst_grid(out_hw)
    sx = Hinv[0, 0] * xs + Hinv[0, 1] * ys + Hinv[0, 2]
    sy = Hinv[1, 0] * xs + Hinv[1, 1] * ys + Hinv[1, 2]
    sz = Hinv[2, 0] * xs + Hinv[2, 1] * ys + Hinv[2, 2]
    sz = jnp.where(jnp.abs(sz) > 1e-12, sz, 1e-12)
    return remap_bilinear(img, sx / sz, sy / sz)
