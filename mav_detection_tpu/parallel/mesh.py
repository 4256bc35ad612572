"""Device-mesh parallelism: frame-batch data parallelism over ICI.

The reference is strictly single-process/single-thread (SURVEY.md §2c); the
TPU-native scaling story is:

* **DP over frames**: per-frame detection math is embarrassingly parallel, so
  a frame batch shards along a ``data`` mesh axis — XLA partitions the fused
  step automatically from sharding annotations (GSPMD), with zero
  communication until metrics reduce.
* **Metric reduction**: TPR/FPR numerator/denominator sums are a ``psum``
  over the mesh inside ``shard_map`` — the reduction rides ICI, and only the
  final scalars hit the host.
* A ``model`` axis is reserved for tensor-parallel RAFT/YOLO variants.
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from mav_detection_tpu.pipeline.detector import (
    DetectionStep,
    FrameOutputs,
    detect_frame_batch,
)


def make_mesh(n_devices: Optional[int] = None,
              axis_names: Tuple[str, ...] = ("data",)) -> Mesh:
    """1-D data mesh over available devices (or the first ``n_devices``)."""
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    shape = (len(devices),) + (1,) * (len(axis_names) - 1)
    return Mesh(np.array(devices).reshape(shape), axis_names)


def shard_frame_batch(mesh: Mesh, *arrays: jax.Array):
    """Place batch-leading arrays with the batch dim split over ``data``."""
    out = []
    for a in arrays:
        spec = P("data", *([None] * (a.ndim - 1)))
        out.append(jax.device_put(a, NamedSharding(mesh, spec)))
    return tuple(out)


def detect_frames_sharded(mesh: Mesh, flow, gt_flow, omega, dt, seg, sky,
                          depth, gt_foe, keys,
                          config: DetectionStep = DetectionStep()) -> FrameOutputs:
    """Run the fused detection step data-parallel over the mesh.

    The batch axis must be divisible by the mesh's ``data`` size. Sharding
    annotations on the inputs let GSPMD partition the whole program; outputs
    come back sharded the same way.
    """
    args = shard_frame_batch(mesh, flow, gt_flow, omega, dt, seg, sky,
                             depth, gt_foe, keys)
    return detect_frame_batch(*args, config=config)


@functools.partial(jax.jit, static_argnames=("mesh",))
def aggregate_metrics_psum(mesh: Mesh, segmentation: jax.Array,
                           estimate: jax.Array,
                           valid: Optional[jax.Array] = None,
                           ) -> Tuple[jax.Array, jax.Array]:
    """Global pixel TPR/FPR over a sharded frame batch via on-mesh psum.

    Demonstrates the collective pattern: each shard reduces its local
    numerators/denominators, one psum over ``data`` produces globals, every
    device returns the same scalars. ``valid`` (n,) masks out frames padded
    to reach a device multiple — an all-zero padded segmentation would
    otherwise count its full pixel area as negatives and bias the global
    FPR low. The per-pixel count definitions are the reference's
    (im_helpers.py:244-252), shared with ``ops.image.metrics.tpr_fpr_counts``.
    """
    from mav_detection_tpu.ops.image.metrics import tpr_fpr_counts

    if valid is None:
        valid = jnp.ones((segmentation.shape[0],), bool)

    def shard_fn(seg_local, est_local, val_local):
        stats = tpr_fpr_counts(seg_local, est_local,
                               val_local.astype(jnp.float32))
        total = jax.lax.psum(stats, axis_name="data")
        return total[0] / total[2], total[1] / total[3]

    fn = jax.shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P("data"), P("data"), P("data")),
        out_specs=(P(), P()),
    )
    return fn(segmentation, estimate, valid)
