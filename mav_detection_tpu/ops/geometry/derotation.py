"""IMU-based flow derotation.

Closed-form rotational flow field synthesized from body angular rates and
subtracted from the measured flow; parity target is
``/root/reference/src/detector.py:70-117``. Pure elementwise math — XLA fuses
this into neighbors for free, and it vmaps over frame batches.
"""
from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("width", "height"))
def derotation_field(
    omega: jax.Array, dt: jax.Array, width: int, height: int
) -> jax.Array:
    """Rotational flow field (h, w, 2) for angular rates ``omega`` (rad/s).

    omega[0] ~ pitch-like, omega[1] ~ yaw-like, omega[2] ~ roll-like in the
    reference's remapped body frame (see ``sim_data.py:56-60``).
    """
    x = jax.lax.broadcasted_iota(jnp.float32, (height, width), 1)
    y = jax.lax.broadcasted_iota(jnp.float32, (height, width), 0)
    # Normalized coordinates in [-1, 1], flipped like the reference
    xn = -(x / width - 0.5) * 2.0
    yn = -(y / height - 0.5) * 2.0

    u = omega[0] * xn * yn - omega[1] * xn ** 2 - omega[1] + omega[2] * yn
    v = -omega[2] * xn + omega[0] + omega[0] * yn ** 2 - omega[1] * xn * yn

    u = u * (width * dt / 2.0)
    v = v * (height * dt / 2.0)
    return jnp.stack([u, v], axis=-1)


@jax.jit
def derotate(flow_uv: jax.Array, omega: jax.Array, dt: jax.Array) -> jax.Array:
    """Subtract the rotation-induced component from a measured flow field.

    ``omega`` here is the angular *difference* over the frame interval divided
    by dt (rad/s), matching ``detector.py:88``.
    """
    h, w = flow_uv.shape[0], flow_uv.shape[1]
    field = derotation_field(omega, dt, w, h)
    return flow_uv - field.astype(flow_uv.dtype)


# Batched variant: (frames, h, w, 2) x (frames, 3) x (frames,)
derotate_batch = jax.jit(jax.vmap(derotate))
