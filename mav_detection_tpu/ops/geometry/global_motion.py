"""Global ego-motion field synthesis and subtraction.

Parity target: ``Detector.flow_vec_subtract``
(``/root/reference/src/detector.py:153-202``) — the fitted affine/homography
is evaluated on the pixel grid to synthesize the camera-induced flow, which is
then subtracted (note the reference computes ``global - flow``, not
``flow - global``; we preserve that sign so magnitudes match bit-for-bit).
"""
from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("height", "width"))
def affine_motion_field(M: jax.Array, height: int, width: int) -> jax.Array:
    """(h, w, 2) displacement field of a 2x3 affine: M(p) - p."""
    xs = jax.lax.broadcasted_iota(jnp.float32, (height, width), 1)
    ys = jax.lax.broadcasted_iota(jnp.float32, (height, width), 0)
    u = M[0, 0] * xs + M[0, 1] * ys + M[0, 2] - xs
    v = M[1, 0] * xs + M[1, 1] * ys + M[1, 2] - ys
    return jnp.stack([u, v], axis=-1)


@partial(jax.jit, static_argnames=("height", "width", "projective"))
def homography_motion_field(H: jax.Array, height: int, width: int,
                            projective: bool = False) -> jax.Array:
    """(h, w, 2) displacement field of a 3x3 homography.

    The reference applies the homography WITHOUT the projective divide
    (a manual 2-row matrix multiply, ``detector.py:167-172``); pass
    ``projective=True`` for the geometrically-correct variant.
    """
    xs = jax.lax.broadcasted_iota(jnp.float32, (height, width), 1)
    ys = jax.lax.broadcasted_iota(jnp.float32, (height, width), 0)
    u = H[0, 0] * xs + H[0, 1] * ys + H[0, 2]
    v = H[1, 0] * xs + H[1, 1] * ys + H[1, 2]
    if projective:
        z = H[2, 0] * xs + H[2, 1] * ys + H[2, 2]
        z = jnp.where(jnp.abs(z) > 1e-12, z, 1e-12)
        u = u / z
        v = v / z
    return jnp.stack([u - xs, v - ys], axis=-1)


@jax.jit
def subtract_global_motion(flow_uv: jax.Array, global_motion: jax.Array
                           ) -> Tuple[jax.Array, jax.Array]:
    """Returns (residual flow = global - flow, its magnitude) — the
    reference's orientation (``detector.py:177``)."""
    residual = global_motion - flow_uv
    mag = jnp.linalg.norm(residual, axis=-1)
    return residual, mag


def warp_diff_method(flow_uv: jax.Array, M: jax.Array,
                     homography: bool = False) -> Tuple[jax.Array, jax.Array]:
    """Warp-and-diff ego-motion removal (reference ``Detector.warp_method``,
    ``detector.py:204-240``): warp the flow field by the fitted transform,
    backfill zero-warped pixels from the original, and return
    (flow difference, its magnitude)."""
    from mav_detection_tpu.ops.geometry.warp import warp_affine, warp_perspective

    if homography:
        stable = warp_perspective(flow_uv, M)
    else:
        stable = warp_affine(flow_uv, M)
    # zero-warped COMPONENTS take the warped (zero) value — the reference's
    # elementwise mask is per channel, not per pixel (detector.py:226-228:
    # ``mask = flow_uv_stable == [0, 0]; flow_uv[mask] = flow_uv_stable[mask]``)
    patched = jnp.where(stable == 0.0, stable, flow_uv)
    diff = patched - stable
    return diff, jnp.linalg.norm(diff, axis=-1)
