"""Jitted image/flow metric kernels.

Metric definitions are bit-compatible with the reference
(``/root/reference/src/im_helpers.py:138-159,244-252``):

* ``get_magnitude`` — L2 norm over the trailing axis.
* ``get_rho`` — ``arctan2(v, u)`` flow angle.
* ``calculate_tpr_fpr`` — pixel-level rates with the reference's exact
  (integer-product) thresholding semantics:
  ``tpr = sum(gt*est > 127) / sum(gt > 127)``,
  ``fpr = sum((255-gt)*est > 127) / sum((255-gt) > 127)``.

These run on device; batch variants vmap over a leading frame axis so a whole
frame batch reduces in one XLA program (and across chips via a later psum).
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


@jax.jit
def get_magnitude(img: jax.Array) -> jax.Array:
    """L2 magnitude over the trailing axis, e.g. (h, w, 2) -> (h, w)."""
    return jnp.linalg.norm(img, axis=-1)


@jax.jit
def get_rho(img: jax.Array) -> jax.Array:
    """Flow angle arctan2(v, u) in radians, (h, w, 2) -> (h, w)."""
    return jnp.arctan2(img[..., 1], img[..., 0])


def _tpr_fpr(gt_img: jax.Array, img: jax.Array) -> Tuple[jax.Array, jax.Array]:
    # Promote to a wide integer type first: the reference multiplies uint8
    # arrays in numpy (which promotes), so 255*255 must not wrap.
    gt = gt_img.astype(jnp.int32)
    est = img.astype(jnp.int32)
    positives = jnp.sum(gt > 127)
    negatives = jnp.sum((255 - gt) > 127)
    true_positives = jnp.sum((gt * est) > 127)
    false_positives = jnp.sum(((255 - gt) * est) > 127)
    tpr = true_positives / positives
    fpr = false_positives / negatives
    return tpr, fpr


def tpr_fpr_counts(gt_img: jax.Array, img: jax.Array,
                   frame_weight: jax.Array) -> jax.Array:
    """Per-batch [tp, fp, pos, neg] counts (float32, shape (4,)) with a
    per-frame weight — the numerator/denominator tier of the reference's
    TPR/FPR (im_helpers.py:244-252), shared by the on-mesh psum reduction
    so single-device and sharded metrics cannot drift apart.

    ``gt_img``/``img``: (n, h, w); ``frame_weight``: (n,) — 0 masks out a
    frame (e.g. padding added to reach a device multiple)."""
    gt = gt_img.astype(jnp.int32)
    est = img.astype(jnp.int32)
    w = frame_weight.astype(jnp.float32)[:, None, None]
    tp = jnp.sum(((gt * est) > 127) * w)
    fp = jnp.sum((((255 - gt) * est) > 127) * w)
    pos = jnp.sum((gt > 127) * w)
    neg = jnp.sum(((255 - gt) > 127) * w)
    return jnp.stack([tp, fp, pos, neg])


calculate_tpr_fpr = jax.jit(_tpr_fpr)
# (frames, h, w) -> per-frame rates in one compiled program.
calculate_tpr_fpr_batch = jax.jit(jax.vmap(_tpr_fpr))


@jax.jit
def masked_mean_flow(flow_uv: jax.Array, mask: jax.Array) -> jax.Array:
    """Mean flow vector over masked pixels: replaces ``np.average(flow[mask], 0)``.

    Static-shape formulation (no boolean gather) so it jits and shards:
    reference behavior at ``/root/reference/src/processor.py:343-344``.
    Returns NaN for an empty mask, matching numpy's empty-average warning path.
    """
    m = mask.astype(flow_uv.dtype)[..., None]
    total = jnp.sum(flow_uv * m, axis=(0, 1))
    count = jnp.sum(m)
    return total / count
