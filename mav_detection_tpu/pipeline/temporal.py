"""Temporal frame engine: ``lax.scan`` over a video with carried state, and
chunked-video sharding across the device mesh.

The reference processes video strictly serially because of temporal state
(flow-history chaining ``detector.py:365-388``, LK traces
``focus_of_expansion.py:112-139``); SURVEY §5 "long-context" names the
TPU-native equivalents:

* ``detect_sequence_scan`` — one compiled program for a whole frame chunk:
  ``lax.scan`` over time carrying the FlowHistory temporal state; per-frame
  outputs stack into batch-shaped arrays. The scan body is the same fused
  detection step as the batched path, so stateless metrics are identical.
  With ``track_sparse=True`` the carry additionally holds the LK FeaturePool
  and the sparse-FoE TraceState ring (reference LK traces with per-track
  rollback, focus_of_expansion.py:88-148): each transition tracks the pool,
  replenishes dead slots from Shi–Tomasi corners, pushes into the trace
  ring, and emits a per-frame trace-based FoE alongside the dense one. The
  reference keeps sparse FoE off its default path; so does this engine.
* ``detect_video_chunked`` — shard a long sequence over the mesh as
  contiguous time chunks. The only inter-frame dependency in the default FoE
  path is the (i-1, i) flow pair, so each device needs exactly ONE halo
  frame from its left neighbor — exchanged with ``lax.ppermute`` over ICI
  inside ``shard_map``, then each device runs its chunk locally.
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from mav_detection_tpu.ops.flow.farneback import FarnebackParams, _farneback_hwb
from mav_detection_tpu.ops.flow.lucas_kanade import (
    FeaturePool,
    lucas_kanade_track,
    replenish_features,
)
from mav_detection_tpu.ops.geometry.boxsearch import (
    FlowHistory,
    make_flow_history,
    push_flow,
)
from mav_detection_tpu.ops.geometry.foe import (
    get_foe_sparse_traced,
    trace_init,
    trace_update,
)
from mav_detection_tpu.pipeline.detector import (
    DetectionStep,
    FrameScalars,
    detect_frame_pair,
)


def _flow_pair(prev: jax.Array, curr: jax.Array,
               params: FarnebackParams) -> jax.Array:
    """(h, w) x2 -> (h, w, 2); non-jit inner (callers jit the whole scan)."""
    return _farneback_hwb(prev[..., None], curr[..., None], params)[:, :, 0]


@functools.partial(jax.jit, static_argnames=("params", "config",
                                             "history_len", "track_sparse",
                                             "n_tracks"))
def detect_sequence_scan(
    frames: jax.Array,        # (T, h, w) grayscale sequence
    omegas: jax.Array,        # (T, 3) angular difference per transition
    dts: jax.Array,           # (T,)
    segmentations: jax.Array, # (T, h, w) uint8
    sky_masks: jax.Array,     # (T, h, w) bool
    depths: jax.Array,        # (T, h, w)
    gt_foes: jax.Array,       # (T, 2)
    key: jax.Array,
    params: FarnebackParams = FarnebackParams(warp="separable", fast=True),
    config: DetectionStep = DetectionStep(),
    history_len: int = 4,
    track_sparse: bool = False,
    n_tracks: int = 256,
):
    """Scan the detection step over T-1 frame transitions with carried state.

    Returns per-transition FrameScalars (leading axis T-1) and the final
    FlowHistory (the temporal state the reference keeps in Python objects).
    With ``track_sparse=True`` additionally returns the (T-1, 2) trace-based
    sparse FoE per transition (reference get_FOE_sparse + trace rollback,
    focus_of_expansion.py:88-148) — the carry then also holds the LK
    FeaturePool and the TraceState ring.
    """
    T, h, w = frames.shape
    # per-transition keys derive from the GLOBAL transition index so the
    # chunked-sharded path reproduces the serial scan bit-exactly
    keys = jax.vmap(lambda i: jax.random.fold_in(key, i))(jnp.arange(1, T))

    def body(carry, inputs):
        if track_sparse:
            prev_frame, history, pool, tstate = carry
        else:
            prev_frame, history = carry
        (curr_frame, omega, dt, seg, sky, depth, gt_foe, k) = inputs
        flow = _flow_pair(prev_frame, curr_frame, params)
        history = push_flow(history, flow)
        out = detect_frame_pair(flow, jnp.zeros_like(flow), omega, dt, seg,
                                sky, depth, gt_foe, k, config=config)
        scalars = FrameScalars(
            foe=out.foe, tpr=out.tpr, fpr=out.fpr, tpr_fixed=out.tpr_fixed,
            fpr_fixed=out.fpr_fixed, sky_tpr=out.sky_tpr,
            sky_fpr=out.sky_fpr, drone_size_pixels=out.drone_size_pixels,
            drone_flow_pixels=out.drone_flow_pixels,
            center_phi=out.center_phi)
        if not track_sparse:
            return (curr_frame, history), scalars
        # LK-trace sparse FoE: track the pool, replenish dead slots from
        # fresh corners (fixed shapes — only invalid slots refresh), push
        # into the trace ring, intersect rolled-back motion lines.
        tracks = lucas_kanade_track(prev_frame, curr_frame, pool.points)
        alive = pool.valid & tracks.status
        pool = replenish_features(FeaturePool(tracks.points, alive),
                                  curr_frame, max_corners=n_tracks)
        new_track = ~alive & pool.valid
        tstate = trace_update(tstate, pool.points, pool.valid, new_track)
        # randomized partner pairing, decoupled from detect_frame_pair's
        # consumption of k (reference pairs with a random line per frame,
        # focus_of_expansion.py:142-145)
        foe_sparse = get_foe_sparse_traced(
            tstate, key=jax.random.fold_in(k, 0x0F0E))
        return (curr_frame, history, pool, tstate), (scalars, foe_sparse)

    f0 = frames[0].astype(jnp.float32)
    init = (f0, make_flow_history(history_len, h, w))
    if track_sparse:
        pool0 = replenish_features(
            FeaturePool(jnp.zeros((n_tracks, 2), jnp.float32),
                        jnp.zeros((n_tracks,), bool)),
            f0, max_corners=n_tracks)
        tstate0 = trace_update(trace_init(n_tracks), pool0.points,
                               pool0.valid, jnp.zeros((n_tracks,), bool))
        init = init + (pool0, tstate0)
    xs = (frames[1:].astype(jnp.float32), omegas[1:], dts[1:],
          segmentations[1:], sky_masks[1:], depths[1:], gt_foes[1:], keys)
    carry, ys = jax.lax.scan(body, init, xs)
    history = carry[1]
    if track_sparse:
        scalars, foe_sparse = ys
        return scalars, history, foe_sparse
    return ys, history


def detect_video_chunked(
    mesh: Mesh,
    frames: jax.Array,        # (T, h, w) with T divisible by mesh size
    omegas: jax.Array,
    dts: jax.Array,
    segmentations: jax.Array,
    sky_masks: jax.Array,
    depths: jax.Array,
    gt_foes: jax.Array,
    key: jax.Array,
    params: FarnebackParams = FarnebackParams(warp="separable", fast=True),
    config: DetectionStep = DetectionStep(),
) -> FrameScalars:
    """Chunked-video sharding: each device takes a contiguous time chunk and
    receives its left neighbor's LAST frame (plus transition aux) over ICI
    via ``ppermute``, so every transition (i-1, i) — including the chunk
    boundaries — is computed exactly once. Returns per-transition scalars for
    transitions 1..T-1 (leading axis T-1, time-ordered).
    """
    n_dev = mesh.devices.size
    T = frames.shape[0]
    if T % n_dev:
        raise ValueError(f"sequence length {T} not divisible by {n_dev} devices")

    perm = [(i, (i + 1) % n_dev) for i in range(n_dev)]

    def shard_fn(frames_l, omegas_l, dts_l, segs_l, skys_l, depths_l,
                 foes_l, key):
        # halo: left neighbor's last frame (device 0 receives junk from the
        # wrap-around; its first transition is masked out by the caller).
        halo = jax.lax.ppermute(frames_l[-1:], "data", perm)
        ext = jnp.concatenate([halo, frames_l], axis=0)
        dev = jax.lax.axis_index("data")
        chunk_len = frames_l.shape[0]

        def body(carry, inputs):
            prev_frame, = carry
            (curr_frame, omega, dt, seg, sky, depth, gt_foe, kk) = inputs
            flow = _flow_pair(prev_frame.astype(jnp.float32),
                              curr_frame.astype(jnp.float32), params)
            out = detect_frame_pair(flow, jnp.zeros_like(flow), omega, dt,
                                    seg, sky, depth, gt_foe, kk,
                                    config=config)
            scal = FrameScalars(
                foe=out.foe, tpr=out.tpr, fpr=out.fpr,
                tpr_fixed=out.tpr_fixed, fpr_fixed=out.fpr_fixed,
                sky_tpr=out.sky_tpr, sky_fpr=out.sky_fpr,
                drone_size_pixels=out.drone_size_pixels,
                drone_flow_pixels=out.drone_flow_pixels,
                center_phi=out.center_phi)
            return (curr_frame,), scal

        # global transition index = dev*chunk_len + local index -> the same
        # fold_in keys as detect_sequence_scan, so results match bit-exactly
        keys = jax.vmap(lambda i: jax.random.fold_in(key[0], i))(
            dev * chunk_len + jnp.arange(chunk_len))
        xs = (frames_l, omegas_l, dts_l, segs_l, skys_l, depths_l, foes_l,
              keys)
        (_,), scal = jax.lax.scan(body, (ext[0],), xs)
        return scal

    specs = P("data")
    fn = jax.shard_map(
        shard_fn, mesh=mesh,
        in_specs=(specs,) * 7 + (P(),),
        out_specs=FrameScalars(*([specs] * 10)),
    )
    out = fn(frames, omegas, dts, segmentations, sky_masks, depths, gt_foes,
             key[None])
    # drop the wrap-around transition (device 0's halo is frames[-1])
    return FrameScalars(*(x[1:] for x in out))
