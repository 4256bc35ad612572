"""Focus-of-Expansion estimation as dense TPU reductions + sparse traces.

Replaces the reference's per-sample Python loops
(``/root/reference/src/focus_of_expansion.py:32-86``) with fixed-shape
vectorized ops:

* ``line_intersections`` — all N flow-line pairs intersected at once by the
  same determinant formula as ``utils.line_intersection``
  (``/root/reference/src/utils.py:183-197``).
* ``foe_ransac`` — the O(N²) 1-NN consensus vote becomes one (N, N) pairwise
  distance matrix + row-wise inlier count + argmax: a single VPU-friendly
  reduction instead of 1000 Python iterations.
* ``get_foe_dense`` — sampling + intersection + vote fused under jit.

Default constants are the reference's: N=1000 samples, magnitude gate 2.5 px,
inlier radius 30 px (``focus_of_expansion.py:21-23,65``).
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

MAGNITUDE_THRESHOLD = 2.5
RANSAC_THRESHOLD = 30.0
NUM_SAMPLES = 1000
TRACE_ROLLBACK = 20


@jax.jit
def line_intersections(
    p1: jax.Array, d1: jax.Array, p2: jax.Array, d2: jax.Array
) -> Tuple[jax.Array, jax.Array]:
    """Intersect line (p1, p1+d1) with line (p2, p2+d2), batched over axis 0.

    Returns (points (N, 2), valid (N,)); parallel lines are invalid (the
    reference returns ``(False, False)`` which numpy coerces to 0 — here we
    return zeros with valid=False, preserving downstream filtering behavior).
    """
    # Endpoint formulation matches the reference call site:
    # line = (coord, flow + coord)  -> a = p, b = p + d
    a1, b1 = p1, p1 + d1
    a2, b2 = p2, p2 + d2
    xdiff = jnp.stack([a1[..., 0] - b1[..., 0], a2[..., 0] - b2[..., 0]], -1)
    ydiff = jnp.stack([a1[..., 1] - b1[..., 1], a2[..., 1] - b2[..., 1]], -1)

    def det(a, b):
        return a[..., 0] * b[..., 1] - a[..., 1] * b[..., 0]

    div = det(xdiff, ydiff)
    d_1 = det(a1, b1)
    d_2 = det(a2, b2)
    d = jnp.stack([d_1, d_2], -1)
    valid = div != 0
    safe_div = jnp.where(valid, div, 1.0)
    x = det(d, xdiff) / safe_div
    y = det(d, ydiff) / safe_div
    pts = jnp.stack([x, y], -1)
    pts = jnp.where(valid[..., None], pts, 0.0)
    return pts, valid


@jax.jit
def foe_ransac(estimates: jax.Array, valid: jax.Array,
               threshold: float = RANSAC_THRESHOLD) -> jax.Array:
    """Consensus vote over candidate FoE points.

    For each valid candidate, count other estimates within ``threshold`` px
    (self excluded — the reference subtracts 1); return the candidate with the
    highest strictly-positive score, else (0, 0) exactly like the reference's
    ``optimum = 0`` initialization (``focus_of_expansion.py:32-54``).
    """
    diff = estimates[:, None, :] - estimates[None, :, :]
    dist = jnp.linalg.norm(diff, axis=-1)
    pair_ok = valid[None, :] & (dist < threshold)
    # subtract the self-match to mirror `score = inliers - 1`
    scores = jnp.sum(pair_ok, axis=1) - 1
    scores = jnp.where(valid, scores, -1)
    best = jnp.argmax(scores)
    best_score = scores[best]
    foe = jnp.where(best_score > 0, estimates[best], jnp.zeros(2, estimates.dtype))
    return foe


@partial(jax.jit, static_argnames=("num_samples",))
def get_foe_dense(
    flow_uv: jax.Array,
    key: jax.Array,
    num_samples: int = NUM_SAMPLES,
    magnitude_threshold: float = MAGNITUDE_THRESHOLD,
    ransac_threshold: float = RANSAC_THRESHOLD,
    sample_yx: Optional[jax.Array] = None,
) -> jax.Array:
    """Dense-flow FoE: sample flow-line pairs, intersect, consensus-vote.

    ``sample_yx`` ((2*num_samples, 2) int array of (y, x)) overrides random
    sampling for deterministic tests against the reference implementation.
    """
    h, w = flow_uv.shape[0], flow_uv.shape[1]
    if sample_yx is None:
        ky, kx = jax.random.split(key)
        ys = jax.random.randint(ky, (2 * num_samples,), 0, h)
        xs = jax.random.randint(kx, (2 * num_samples,), 0, w)
    else:
        ys, xs = sample_yx[..., 0], sample_yx[..., 1]

    flows = flow_uv[ys, xs]  # (2N, 2) gathered flow vectors
    coords = jnp.stack([xs, ys], -1).astype(flow_uv.dtype)  # (x, y) order

    p1, f1 = coords[:num_samples], flows[:num_samples]
    p2, f2 = coords[num_samples:], flows[num_samples:]

    # Reference gates on the *second* line's magnitude only
    # (focus_of_expansion.py:78).
    mag2 = jnp.linalg.norm(f2, axis=-1)
    gate = mag2 >= magnitude_threshold

    pts, parallel_ok = line_intersections(p1, f1, p2, f2)
    # Reference drops rows with x == 0.0 (its "invalid" sentinel); an exact-0
    # x from a real intersection is measure-zero so this matches behavior.
    valid = gate & parallel_ok & (pts[..., 0] != 0.0)
    pts = jnp.where(valid[..., None], pts, 0.0)
    return foe_ransac(pts, valid, ransac_threshold)


def _partner_lines(
    cur: jax.Array, d: jax.Array, valid: jax.Array,
    key: Optional[jax.Array],
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Pick one partner motion line per track for intersection.

    The reference pairs each line with an iid-uniform random line — including
    possibly itself, which intersects as parallel and is dropped
    (``focus_of_expansion.py:142-145``). With a ``key`` we use a PRNG
    *permutation*: same marginal (uniform partner), no partner collisions, and
    fixed points degrade exactly like the reference's self-picks (parallel ->
    invalid). Without a key the pairing is the deterministic rolled
    derangement (reproducible pipelines and tests).
    """
    if key is None:
        idx = jnp.roll(jnp.arange(cur.shape[0]), 1)
    else:
        idx = jax.random.permutation(key, cur.shape[0])
    return cur[idx], d[idx], valid[idx]


@jax.jit
def get_foe_sparse(points_old: jax.Array, points_new: jax.Array,
                   valid: jax.Array,
                   ransac_threshold: float = RANSAC_THRESHOLD,
                   key: Optional[jax.Array] = None) -> jax.Array:
    """Sparse-track FoE: intersect motion lines of tracked features.

    Device reformulation of the reference's LK-trace variant
    (``focus_of_expansion.py:88-148``): each valid track (old -> new) defines
    a motion line; each line is paired with a partner line (random
    permutation under ``key``, rolled derangement otherwise — see
    ``_partner_lines``), intersected, and the same consensus vote picks the
    FoE. Fixed shapes; invalid tracks are masked out rather than filtered.
    """
    d = points_new - points_old
    moving = valid & (jnp.linalg.norm(d, axis=-1) > 0.5)
    # the partner must pass the SAME displacement gate — a near-stationary
    # partner line is noise-dominated and its intersection must not vote
    p2, d2, m2 = _partner_lines(points_new, d, moving, key)
    pts, ok = line_intersections(points_new, -d, p2, -d2)
    ok = ok & moving & m2
    pts = jnp.where(ok[..., None], pts, 0.0)
    return foe_ransac(pts, ok, ransac_threshold)


# ------------------------------------------------------------ trace history
class TraceState(NamedTuple):
    """Fixed-capacity per-track position history (functional ring buffer).

    Device reformulation of the reference's LK trace lists with ``ROLLBACK``
    frames of history (``/root/reference/src/focus_of_expansion.py:112-139``):
    the sparse FoE intersects each track's CURRENT motion against its position
    up to ``rollback`` frames ago — a long baseline makes the motion lines far
    better conditioned than one-frame displacements. Tracks replaced by LK
    replenishment restart their age; surviving tracks keep their history.

    Shapes: positions (T, N, 2); alive (T, N); age (N,); head () int32.
    """
    positions: jax.Array
    alive: jax.Array
    age: jax.Array
    head: jax.Array


def trace_init(num_tracks: int, capacity: int = TRACE_ROLLBACK + 1) -> TraceState:
    return TraceState(
        positions=jnp.zeros((capacity, num_tracks, 2), jnp.float32),
        alive=jnp.zeros((capacity, num_tracks), bool),
        # age = frames of history available; -1 so the first push lands at 0
        age=jnp.full((num_tracks,), -1, jnp.int32),
        head=jnp.asarray(-1, jnp.int32),
    )


@jax.jit
def trace_update(state: TraceState, points: jax.Array, valid: jax.Array,
                 new_track: jax.Array) -> TraceState:
    """Push one frame of track positions into the ring.

    ``valid`` marks tracks alive this frame; ``new_track`` marks pool slots
    that replenishment just re-seeded (their age restarts, severing the old
    trace — the reference clears the trace list on replacement).
    """
    cap = state.positions.shape[0]
    head = (state.head + 1) % cap
    positions = jax.lax.dynamic_update_index_in_dim(
        state.positions, points.astype(jnp.float32), head, 0)
    alive = jax.lax.dynamic_update_index_in_dim(
        state.alive, valid, head, 0)
    age = jnp.where(new_track, 0, jnp.where(valid, state.age + 1, 0))
    return TraceState(positions=positions, alive=alive, age=age, head=head)


@partial(jax.jit, static_argnames=("rollback",))
def get_foe_sparse_traced(state: TraceState,
                          rollback: int = TRACE_ROLLBACK,
                          ransac_threshold: float = RANSAC_THRESHOLD,
                          min_baseline: float = 0.5,
                          key: Optional[jax.Array] = None) -> jax.Array:
    """Sparse FoE from trace history: per track, intersect the motion line
    (position ``min(rollback, age)`` frames ago -> current position) with a
    partner line (random permutation under ``key``, rolled otherwise), then
    the standard consensus vote."""
    cap, n = state.alive.shape
    head = state.head
    cur = state.positions[head]                 # (N, 2)
    cur_ok = state.alive[head]

    # per-track rollback clamped by age (and ring capacity)
    rb = jnp.minimum(jnp.minimum(state.age, rollback), cap - 1)  # (N,)
    idx = (head - rb) % cap                     # (N,) ring index per track
    old = jnp.take_along_axis(
        state.positions, idx[None, :, None].astype(jnp.int32), axis=0)[0]
    old_ok = jnp.take_along_axis(state.alive, idx[None, :], axis=0)[0]

    d = cur - old
    valid = (cur_ok & old_ok & (rb > 0)
             & (jnp.linalg.norm(d, axis=-1) > min_baseline))

    p2, d2, v2 = _partner_lines(cur, d, valid, key)
    pts, ok = line_intersections(cur, -d, p2, -d2)
    ok = ok & valid & v2
    pts = jnp.where(ok[..., None], pts, 0.0)
    return foe_ransac(pts, ok, ransac_threshold)


@jax.jit
def get_phi(derotated_flow_uv: jax.Array, foe: jax.Array) -> jax.Array:
    """Per-pixel angle (degrees) between flow vector and the ray from the FoE.

    Parity target: ``focus_of_expansion.py:150-184`` — arccos of the
    normalized dot product with a 1e-6 norm floor and [-1, 1] clipping.
    """
    h, w = derotated_flow_uv.shape[0], derotated_flow_uv.shape[1]
    x_coords = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
    y_coords = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)

    diff1 = derotated_flow_uv
    ray_x = x_coords - foe[0]
    ray_y = y_coords - foe[1]

    flow_magnitude = jnp.linalg.norm(diff1, axis=-1)
    img_distance = jnp.sqrt(ray_x ** 2 + ray_y ** 2)
    norm = jnp.maximum(1e-6, flow_magnitude * img_distance)

    arccos_arg = (diff1[..., 0] * ray_x + diff1[..., 1] * ray_y) / norm
    arccos_arg = jnp.clip(arccos_arg, -1.0, 1.0)
    angle = jnp.arccos(arccos_arg)
    angle = jnp.nan_to_num(angle)
    return jnp.rad2deg(angle)
