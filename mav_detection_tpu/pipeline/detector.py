"""The fused per-frame detection step.

This is the device-side replacement for the reference's per-frame Python hot
loop (``/root/reference/src/processor.py:277-396``, FoE branch): derotation,
dense-FoE vote, phi map, dynamic + fixed threshold masks, pixel TPR/FPR, sky
validation, and the per-frame scalar outputs — one jitted program per frame
pair, vmappable over a frame batch and shardable over a device mesh.

Everything returned is a fixed-shape array so a whole batch of FrameResults
materializes with a single device->host transfer.
"""
from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from mav_detection_tpu.ops.geometry import (
    derotate,
    detection_masks,
    get_foe_dense,
    get_phi,
)
from mav_detection_tpu.ops.image.metrics import (
    _tpr_fpr,
    masked_mean_flow,
)
from mav_detection_tpu.ops.image.boxes import get_simple_bounding_box_device


class FrameOutputs(NamedTuple):
    """Per-frame scalars + masks; mirrors FrameResult's fields
    (``/root/reference/src/frame_result.py:4-17``) plus debug arrays."""
    foe: jax.Array                # (2,) estimated FoE (x, y)
    tpr: jax.Array                # () dynamic-threshold TPR
    fpr: jax.Array                # ()
    tpr_fixed: jax.Array          # () fixed 15-degree TPR
    fpr_fixed: jax.Array          # ()
    sky_tpr: jax.Array            # ()
    sky_fpr: jax.Array            # ()
    drone_size_pixels: jax.Array  # () segmentation area
    drone_flow_pixels: jax.Array  # (2,) mean GT-derotated flow on the drone
    center_phi: jax.Array         # () angle of drone center seen from GT FoE
    phi: jax.Array                # (h, w) angle map (degrees)
    total_mask: jax.Array         # (h, w) dynamic-threshold detection mask
    estimate_fixed: jax.Array     # (h, w) fixed-threshold detection mask
    flow_derotated: jax.Array     # (h, w, 2)


class DetectionStep(NamedTuple):
    """Static configuration for the fused step."""
    foe_samples: int = 1000
    # Batch vectorization strategy. "vmap" (default) batches every stage and
    # is required when the batch axis is GSPMD-sharded over a mesh (lax.map
    # over a sharded axis forces gathers). "map" iterates the single-frame
    # program instead — an escape hatch for batch-dependent miscompiles
    # (cf. the RAFT vmap>=8 NaN issue, models/raft.py). Measured on v5e
    # (PERF.md "Batching"): the detect stage costs ~0.04-0.05 ms/frame under
    # EITHER mode at batch 1 and 8, so this knob is about correctness
    # containment, not speed — the batch-8 end-to-end deficit sits in the
    # flow solver's batch scaling, not here.
    batch_mode: str = "vmap"


@functools.partial(jax.jit, static_argnames=("config",))
def detect_frame_pair(
    flow_uv: jax.Array,          # (h, w, 2) measured flow
    gt_flow_uv: jax.Array,       # (h, w, 2) ground-truth flow (zeros if none)
    omega: jax.Array,            # (3,) angular difference / dt (rad/s)
    dt: jax.Array,               # () frame interval (s)
    segmentation: jax.Array,     # (h, w) uint8 target mask
    sky_mask: jax.Array,         # (h, w) bool sky segmentation
    depth: jax.Array,            # (h, w) float depth buffer (for sky GT)
    gt_foe: jax.Array,           # (2,) ground-truth FoE (x, y); NaN if none
    key: jax.Array,              # PRNG key for FoE sampling
    config: DetectionStep = DetectionStep(),
) -> FrameOutputs:
    flow_uv = flow_uv.astype(jnp.float32)

    # 1. IMU derotation (reference: processor.py:306-309)
    flow_derot = derotate(flow_uv, omega, dt)
    gt_flow_derot = derotate(gt_flow_uv.astype(jnp.float32), omega, dt)
    flow_mag = jnp.linalg.norm(flow_derot, axis=-1)

    # 2. sky validation vs depth (dataset.validate_sky_segment,
    #    dataset.py:173-175): GT sky = depth > 0.8 * max
    sky_gt = depth > 0.8 * jnp.max(depth)
    sky_tpr, sky_fpr = _tpr_fpr(sky_gt.astype(jnp.uint8) * 255,
                                sky_mask.astype(jnp.uint8) * 255)

    # 3. dense FoE vote (focus_of_expansion.py:56-86)
    foe = get_foe_dense(flow_derot, key, num_samples=config.foe_samples)

    # 4. phi map + masks + metrics (processor.py:323-351)
    phi = get_phi(flow_derot, foe)
    total_mask, estimate_fixed = detection_masks(phi, flow_mag, sky_mask)

    seg_pos = segmentation > 127
    tpr, fpr = _tpr_fpr(segmentation, 255 * total_mask.astype(jnp.int32))
    tpr_fixed, fpr_fixed = _tpr_fpr(segmentation, 255 * estimate_fixed.astype(jnp.int32))

    drone_flow_avg_gt = masked_mean_flow(gt_flow_derot, seg_pos)
    drone_size = jnp.sum(seg_pos)

    # center_phi: angle of the target's bbox center seen from the GT FoE
    box = get_simple_bounding_box_device(segmentation)
    center = jnp.stack([(box[0] + box[2]) / 2.0, (box[1] + box[3]) / 2.0])
    center_phi = jnp.rad2deg(
        jnp.arctan2(center[1] - gt_foe[1], center[0] - gt_foe[0]))

    return FrameOutputs(
        foe=foe,
        tpr=tpr,
        fpr=fpr,
        tpr_fixed=tpr_fixed,
        fpr_fixed=fpr_fixed,
        sky_tpr=sky_tpr,
        sky_fpr=sky_fpr,
        drone_size_pixels=drone_size,
        drone_flow_pixels=drone_flow_avg_gt,
        center_phi=center_phi,
        phi=phi,
        total_mask=total_mask,
        estimate_fixed=estimate_fixed,
        flow_derotated=flow_derot,
    )


@functools.partial(jax.jit, static_argnames=("config",))
def detect_frame_batch(flow_uv, gt_flow_uv, omega, dt, segmentation, sky_mask,
                       depth, gt_foe, keys,
                       config: DetectionStep = DetectionStep()) -> FrameOutputs:
    """Batched variant over a leading frame axis; ``keys`` is (n, 2) PRNG keys."""
    fn = functools.partial(detect_frame_pair, config=config)
    args = (flow_uv, gt_flow_uv, omega, dt, segmentation, sky_mask, depth,
            gt_foe, keys)
    if config.batch_mode == "map":
        return jax.lax.map(lambda xs: fn(*xs), args)
    return jax.vmap(fn)(*args)


class FrameScalars(NamedTuple):
    """Scalar-only outputs: lets XLA dead-code-eliminate the full-resolution
    debug arrays when artifacts aren't requested, so only a few hundred bytes
    leave the device per batch."""
    foe: jax.Array
    tpr: jax.Array
    fpr: jax.Array
    tpr_fixed: jax.Array
    fpr_fixed: jax.Array
    sky_tpr: jax.Array
    sky_fpr: jax.Array
    drone_size_pixels: jax.Array
    drone_flow_pixels: jax.Array
    center_phi: jax.Array


def _to_scalars(out: FrameOutputs) -> FrameScalars:
    return FrameScalars(
        foe=out.foe, tpr=out.tpr, fpr=out.fpr, tpr_fixed=out.tpr_fixed,
        fpr_fixed=out.fpr_fixed, sky_tpr=out.sky_tpr, sky_fpr=out.sky_fpr,
        drone_size_pixels=out.drone_size_pixels,
        drone_flow_pixels=out.drone_flow_pixels, center_phi=out.center_phi)


@functools.partial(jax.jit, static_argnames=("config",))
def detect_frame_batch_scalars(flow_uv, gt_flow_uv, omega, dt, segmentation,
                               sky_mask, depth, gt_foe, keys,
                               config: DetectionStep = DetectionStep()
                               ) -> FrameScalars:
    fn = functools.partial(detect_frame_pair, config=config)
    args = (flow_uv, gt_flow_uv, omega, dt, segmentation, sky_mask, depth,
            gt_foe, keys)
    if config.batch_mode == "map":
        # project to scalars INSIDE the map body: the scan then stacks a few
        # hundred bytes per frame instead of full-resolution debug arrays
        return jax.lax.map(lambda xs: _to_scalars(fn(*xs)), args)
    return _to_scalars(jax.vmap(fn)(*args))
