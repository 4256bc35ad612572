"""Color-space conversions (device-side, plus the shared host gray)."""
from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp


def bgr_to_gray_host(img, dtype=np.float32) -> np.ndarray:
    """Host-side (NumPy) BT.601 BGR -> gray — the one place that owns the
    gray convention for host staging and the validator's flow fallback
    (matches :func:`bgr_to_gray` / cv2.COLOR_BGR2GRAY)."""
    x = np.asarray(img, np.float32)
    g = 0.114 * x[..., 0] + 0.587 * x[..., 1] + 0.299 * x[..., 2]
    if np.issubdtype(np.dtype(dtype), np.integer):
        return np.round(g).astype(dtype)
    return g.astype(dtype)


@jax.jit
def bgr_to_gray(img: jax.Array) -> jax.Array:
    """BGR (h, w, 3) -> grayscale (h, w) with ITU-R BT.601 weights.

    Matches cv2.cvtColor(..., COLOR_BGR2GRAY): 0.114 B + 0.587 G + 0.299 R,
    rounded when the input is an integer type.
    """
    x = img.astype(jnp.float32)
    gray = 0.114 * x[..., 0] + 0.587 * x[..., 1] + 0.299 * x[..., 2]
    if jnp.issubdtype(img.dtype, jnp.integer):
        return jnp.round(gray).astype(img.dtype)
    return gray


@jax.jit
def rgb_to_gray(img: jax.Array) -> jax.Array:
    """RGB (h, w, 3) -> grayscale (h, w), BT.601."""
    x = img.astype(jnp.float32)
    gray = 0.299 * x[..., 0] + 0.587 * x[..., 1] + 0.114 * x[..., 2]
    if jnp.issubdtype(img.dtype, jnp.integer):
        return jnp.round(gray).astype(img.dtype)
    return gray
