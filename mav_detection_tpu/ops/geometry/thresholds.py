"""Detection threshold masks.

The dynamic radial-error threshold ``0.25 ± (0.5 + 8/|OF|)`` and the fixed
15° variant, exactly as applied in the reference's hot loop
(``/root/reference/src/processor.py:331-341``; model fit from
``plot_radial_error.py:51-55``).
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

FIXED_ANGLE_THRESHOLD = 15.0
DYNAMIC_BASE = 0.25
DYNAMIC_OFFSET = 0.5
DYNAMIC_SCALE = 8.0
MIN_FLOW_DYNAMIC = 0.5
MIN_FLOW_FIXED = 1.0


@jax.jit
def dynamic_angle_mask(phi_deg: jax.Array, flow_mag: jax.Array) -> jax.Array:
    """phi outside the band 0.25 ± (0.5 + 8/|OF|) degrees."""
    band = DYNAMIC_OFFSET + DYNAMIC_SCALE / flow_mag
    above = phi_deg > (DYNAMIC_BASE + band)
    below = phi_deg < (DYNAMIC_BASE - band)
    return jnp.logical_or(above, below)


@jax.jit
def fixed_angle_mask(phi_deg: jax.Array, flow_mag: jax.Array, sky_mask: jax.Array) -> jax.Array:
    """phi * (|OF| > 1.0) * ~sky > 15°  (processor.py:340-341)."""
    return (phi_deg * (flow_mag > MIN_FLOW_FIXED) * (~sky_mask)) > FIXED_ANGLE_THRESHOLD


@jax.jit
def detection_masks(
    phi_deg: jax.Array, flow_mag: jax.Array, sky_mask: jax.Array
) -> Tuple[jax.Array, jax.Array]:
    """(dynamic total_mask, fixed estimate mask) per processor.py:331-341."""
    angle_threshold = dynamic_angle_mask(phi_deg, flow_mag)
    total_mask = (flow_mag > MIN_FLOW_DYNAMIC) & (~sky_mask) & angle_threshold
    estimate_fixed = fixed_angle_mask(phi_deg, flow_mag, sky_mask)
    return total_mask, estimate_fixed
