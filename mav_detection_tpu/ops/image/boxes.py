"""Threshold-based bounding-box fitting.

Replaces the reference's per-row/per-column Python loops
(``/root/reference/src/im_helpers.py:55-84``) with vectorized reductions; the
device variant is a jittable fixed-shape kernel returning index arrays.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from mav_detection_tpu.core.rectangle import Rectangle


def get_simple_bounding_box(img: np.ndarray) -> Rectangle:
    """Fit a box around pixels with intensity > 0.1 * max (host/numpy)."""
    img = np.asarray(img)
    threshold = 0.1 * np.max(img) if img.size else 0.0
    mask = img > threshold
    if mask.ndim > 2:
        mask = mask.any(axis=tuple(range(2, mask.ndim)))
    rows = np.flatnonzero(mask.any(axis=1))
    cols = np.flatnonzero(mask.any(axis=0))
    if rows.size == 0 or cols.size == 0:
        return Rectangle.from_points((-1, -1), (-1, -1))
    return Rectangle.from_points(
        (int(cols[0]), int(rows[0])), (int(cols[-1]), int(rows[-1]))
    )


@jax.jit
def get_simple_bounding_box_device(img: jax.Array) -> jax.Array:
    """Device variant: returns [start_x, start_y, end_x, end_y] (−1s if empty)."""
    threshold = 0.1 * jnp.max(img)
    mask = img > threshold
    if mask.ndim > 2:
        mask = mask.any(axis=tuple(range(2, mask.ndim)))
    row_any = mask.any(axis=1)
    col_any = mask.any(axis=0)
    h, w = mask.shape
    row_idx = jnp.arange(h)
    col_idx = jnp.arange(w)
    start_y = jnp.min(jnp.where(row_any, row_idx, h))
    end_y = jnp.max(jnp.where(row_any, row_idx, -1))
    start_x = jnp.min(jnp.where(col_any, col_idx, w))
    end_x = jnp.max(jnp.where(col_any, col_idx, -1))
    empty = ~jnp.any(mask)
    box = jnp.stack([start_x, start_y, end_x, end_y])
    return jnp.where(empty, jnp.full((4,), -1, box.dtype), box)


def box_array_to_rectangle(box: np.ndarray) -> Rectangle:
    """Convert the device [sx, sy, ex, ey] array back into a Rectangle."""
    sx, sy, ex, ey = [int(v) for v in np.asarray(box)]
    return Rectangle.from_points((sx, sy), (ex, ey))
