"""Device-side image resizing built on jax.image (XLA-fusable)."""
from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("shape", "method"))
def resize(img: jax.Array, shape: Tuple[int, ...], method: str = "linear") -> jax.Array:
    """Resize trailing spatial dims to ``shape`` (h, w), keeping channels."""
    out_shape = tuple(shape) + tuple(img.shape[len(shape):])
    return jax.image.resize(img, out_shape, method=method)


def resize_percent(img: jax.Array, scale_percent: float, method: str = "linear") -> jax.Array:
    """Percent-based resize (reference ``im_helpers.resize_percent``,
    ``/root/reference/src/im_helpers.py:254-260``)."""
    h = int(img.shape[0] * scale_percent / 100)
    w = int(img.shape[1] * scale_percent / 100)
    return resize(img, (h, w), method=method)


@partial(jax.jit, static_argnames=("width",))
def resize_width(img: jax.Array, width: int) -> jax.Array:
    """Aspect-preserving resize to a target width (imutils.resize semantics)."""
    h = int(round(img.shape[0] * width / img.shape[1]))
    return resize(img, (h, width))
