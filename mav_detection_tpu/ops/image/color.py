"""Color-space conversions (device-side)."""
from __future__ import annotations

import jax
import jax.numpy as jnp


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
