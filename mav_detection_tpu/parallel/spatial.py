"""Spatial (row-sharded) Farneback flow over a device mesh.

SURVEY §2c lists tensor/spatial parallelism as the one mesh axis the
reference has no analogue of; this module supplies it for the flow solver:
a single hi-res frame pair (AirSim 1920x1024, ``etc/settings.json:17-19``)
is sharded over image ROWS across the mesh, so the per-frame latency of the
dominant stage (the iterate/refit loop) drops ~linearly with the device
count instead of only throughput-batching.

Decomposition (all halos are exact, not approximations):

* Each device owns a contiguous row band of the frame (``h / P`` rows).
* Polynomial expansion is computed locally on the band plus a static halo
  sliced from the replicated smoothed frame (the frame is ~8 MB — an ICI
  broadcast — while the 5-channel coefficient slabs it expands into are 5x
  that, so local expansion with ~2*(halo)/h_local redundant rows is cheaper
  than exchanging coefficients).
* Each matrix refit needs the CURRENT flow within ``max_shift + winsize/2
  + 2`` rows of the band: exchanged with two ``lax.ppermute`` ring hops
  inside ``shard_map`` (a few hundred KB per refit over ICI).
* The box-blur + 2x2 solve runs on the haloed normal-equation slab and
  crops back to the band. Slab rows outside the image are replaced by the
  clamped edge row first, so the band matrices' "edge" handling at slab
  boundaries reproduces the unsharded solver's global-edge semantics
  exactly; the inside-image warp gate uses global row coordinates
  (``_update_matrices(row0=...)``).

Coarse pyramid levels whose per-device band would be smaller than the halo
run replicated instead (identical compute on every device, no
communication) — they are a few percent of the work.

Reference behavior being distributed: cv2.calcOpticalFlowFarneback semantics
per ``/root/reference/src/farneback.py:76-80`` (the whole-solver parity
story lives in ops/flow/farneback.py).
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh
from jax.sharding import PartitionSpec as P

from mav_detection_tpu.ops.flow.farneback import (
    FarnebackParams,
    _border_scale_map,
    _gaussian_blur,
    _jacobi_level,
    _level_iter_count,
    _poly_exp,
    _pyramid_scales,
    _refit_schedule,
    _resize_linear,
    _solve_flow,
    _update_matrices,
)

# Product hi-res configuration: separable warp (the spatial halo is sized by
# max_shift, and the gather fallback would clamp reads at slab edges instead
# of image edges), cv2-semantics 3-layer pyramid.
SPATIAL_PARAMS = FarnebackParams(warp="separable", levels=2, pyr_scale=0.5,
                                 iterations=6, max_shift=8)


def _level_replicated(i0: jax.Array, i1: jax.Array, flow: jax.Array,
                      border: jax.Array, params: FarnebackParams,
                      iterations: Optional[int] = None) -> jax.Array:
    """One pyramid level of the plain Jacobi loop (identical on every
    device — no communication). Shares the solver's ``_jacobi_level`` so the
    refit schedule cannot drift from the unsharded path this engine is gated
    against."""
    R0 = _poly_exp(i0, params.poly_n, params.poly_sigma, params.precision)
    R1 = _poly_exp(i1, params.poly_n, params.poly_sigma, params.precision)
    return _jacobi_level(R0, R1, flow, border, params, warp="separable",
                         iterations=iterations)


def _level_sharded(i0: jax.Array, i1: jax.Array, flow: jax.Array,
                   border: jax.Array, params: FarnebackParams,
                   mesh: Mesh, axis: str,
                   iterations: Optional[int] = None) -> jax.Array:
    """One pyramid level with the iterate/refit loop sharded over rows."""
    h, w, b = i0.shape
    n_dev = mesh.shape[axis]
    hl = h // n_dev
    S = params.max_shift
    fh_m = params.winsize // 2            # box-blur halo
    fh_r = S + fh_m + 2                   # flow/M slab halo (warp reach)
    e = fh_r + params.poly_n              # image slab margin for poly_exp

    # replicate-pad rows: physical replication == the band matrices' "edge"
    # mode, so edge devices see exact global-edge semantics
    i0p = jnp.pad(i0, ((e, e), (0, 0), (0, 0)), mode="edge")
    i1p = jnp.pad(i1, ((e, e), (0, 0), (0, 0)), mode="edge")
    borderp = jnp.pad(border, ((fh_r, fh_r), (0, 0)), mode="edge")
    perm_up = [(i, i + 1) for i in range(n_dev - 1)]
    perm_dn = [(i + 1, i) for i in range(n_dev - 1)]

    def body(i0p, i1p, flow_l, borderp):
        idx = jax.lax.axis_index(axis)
        r0 = idx * hl
        slab0 = jax.lax.dynamic_slice_in_dim(i0p, r0, hl + 2 * e, 0)
        slab1 = jax.lax.dynamic_slice_in_dim(i1p, r0, hl + 2 * e, 0)
        # local expansion; crop the poly_n rows the slab edges pollute
        R0 = _poly_exp(slab0, params.poly_n, params.poly_sigma,
                       params.precision)[params.poly_n:
                                         params.poly_n + hl + 2 * fh_r]
        R1 = _poly_exp(slab1, params.poly_n, params.poly_sigma,
                       params.precision)[params.poly_n:
                                         params.poly_n + hl + 2 * fh_r]
        # R1 slab rows beyond the image must be replicas of the edge row:
        # the unsharded warp clamps out-of-image reads to R1[edge], whereas
        # poly-of-replicate-padded pixels differ (the fit sees a flat
        # extension). R0 is only ever read at aligned in-image rows.
        g_r = jnp.arange(hl + 2 * fh_r) + (r0 - fh_r)
        R1 = jnp.where((g_r < 0)[:, None, None, None], R1[fh_r][None], R1)
        R1 = jnp.where((g_r > h - 1)[:, None, None, None],
                       R1[hl + fh_r - 1][None], R1)
        bord = jax.lax.dynamic_slice_in_dim(borderp, r0, hl + 2 * fh_r, 0)

        def refit(fl):
            # one ring hop each way: the rows a refit reads beyond the band
            above = jax.lax.ppermute(fl[-fh_r:], axis, perm_up)
            below = jax.lax.ppermute(fl[:fh_r], axis, perm_dn)
            fe = jnp.concatenate([above, fl, below], axis=0)
            M = _update_matrices(R0, R1, fe, bord, "separable", S,
                                 row0=r0 - fh_r, global_h=h)
            sl = M[fh_r - fh_m: fh_r + hl + fh_m]
            # out-of-image slab rows -> clamped edge row, so the blur's
            # slab-edge replication equals the unsharded global-edge math
            g = jnp.arange(hl + 2 * fh_m) + (r0 - fh_m)
            sl = jnp.where((g < 0)[:, None, None, None], sl[fh_m][None], sl)
            sl = jnp.where((g > h - 1)[:, None, None, None],
                           sl[hl + fh_m - 1][None], sl)
            return sl

        n = params.iterations if iterations is None else iterations
        um_iters = _refit_schedule(params, n)
        M = refit(flow_l)
        fl = flow_l
        for it in range(n):
            fl = _solve_flow(M, params.winsize,
                             params.precision)[fh_m: fh_m + hl]
            if it in um_iters:
                M = refit(fl)
        return fl

    return shard_map(body, mesh=mesh,
                     in_specs=(P(), P(), P(axis), P()),
                     out_specs=P(axis))(i0p, i1p, flow, borderp)


@functools.partial(jax.jit, static_argnames=("params", "mesh", "axis"))
def _flow_spatial(prev: jax.Array, curr: jax.Array,
                  params: FarnebackParams, mesh: Mesh,
                  axis: str) -> jax.Array:
    prev = prev.astype(jnp.float32)[..., None]
    curr = curr.astype(jnp.float32)[..., None]
    h, w, b = prev.shape
    n_dev = mesh.shape[axis]
    S = params.max_shift
    fh_r = S + params.winsize // 2 + 2

    scales = _pyramid_scales(h, w, params)
    flow: Optional[jax.Array] = None
    for k_level in reversed(range(len(scales))):
        scale = scales[k_level]
        sigma = (1.0 / scale - 1.0) * 0.5
        smooth_sz = max(int(round(sigma * 5)) | 1, 3)
        lh, lw = int(round(h * scale)), int(round(w * scale))

        i0 = _resize_linear(
            _gaussian_blur(prev, smooth_sz, sigma, params.precision), (lh, lw))
        i1 = _resize_linear(
            _gaussian_blur(curr, smooth_sz, sigma, params.precision), (lh, lw))
        if flow is None:
            flow = jnp.zeros((lh, lw, b, 2), jnp.float32)
        else:
            flow = _resize_linear(flow, (lh, lw)) * (1.0 / params.pyr_scale)
        border = _border_scale_map(lh, lw)

        n_it = _level_iter_count(params, k_level)
        if lh % n_dev == 0 and lh // n_dev >= fh_r:
            flow = _level_sharded(i0, i1, flow, border, params, mesh, axis,
                                  iterations=n_it)
        else:
            # band smaller than the halo: replicate this (cheap) level
            flow = _level_replicated(i0, i1, flow, border, params,
                                     iterations=n_it)
    return flow


def farneback_flow_spatial(prev: jax.Array, curr: jax.Array,
                           params: FarnebackParams = SPATIAL_PARAMS,
                           mesh: Optional[Mesh] = None,
                           axis: str = "data") -> jax.Array:
    """Dense flow for ONE hi-res frame pair, row-sharded across ``mesh``.

    ``prev``/``curr`` are grayscale (h, w); returns (h, w, 2). Latency of
    the iterate/refit loop scales ~1/P with the mesh size (vs
    ``farneback_flow_batch``'s throughput-only batching). Exact up to
    matmul-tiling float reassociation vs the unsharded separable-warp
    solver (gated in tests to <1e-3 px).

    Requires ``warp='separable'`` semantics: the halo is sized by
    ``max_shift``; pick ``max_shift`` >= the expected peak displacement
    (the exactness guard of warp='auto' cannot ride here because the gather
    fallback would clamp reads at band edges, not image edges).
    """
    if mesh is None:
        from mav_detection_tpu.parallel.mesh import make_mesh

        mesh = make_mesh()
    if params.warp not in ("separable", "auto"):
        from dataclasses import replace

        params = replace(params, warp="separable")
    if prev.shape[0] % mesh.shape[axis]:
        raise ValueError(
            f"image height {prev.shape[0]} must divide by the mesh axis "
            f"size {mesh.shape[axis]} (pad the frame or resize)")
    return _flow_spatial(prev, curr, params, mesh, axis)[:, :, 0]


def raft_flow_spatial(image1: jax.Array, image2: jax.Array, params=None,
                      mesh: Optional[Mesh] = None, axis: str = "data",
                      iters: int = 0, config=None) -> jax.Array:
    """RAFT inference for ONE hi-res frame pair, row-sharded across ``mesh``.

    The net-flow counterpart of ``farneback_flow_spatial``: the frame pair
    is placed with its rows sharded over the mesh and the standard inference
    graph runs under GSPMD, which partitions the conv encoders / GRU with
    automatic halo exchange and the per-row corr-volume matmuls along the
    sharded row axis (the volume build is a batched per-pooled-row einsum —
    models/raft.py ``build_local_corr_volumes`` — so it splits cleanly).
    Exactness vs the unsharded graph is float-reassociation only, gated in
    ``tests/test_parallel_pipeline.py``.
    """
    import jax as _jax
    from jax.sharding import NamedSharding
    from jax.sharding import PartitionSpec as _P

    from mav_detection_tpu.models.raft import (INFERENCE_CONFIG,
                                               PRODUCT_ITERS, raft_flow)

    if config is None:
        config = INFERENCE_CONFIG

    if mesh is None:
        from mav_detection_tpu.parallel.mesh import make_mesh

        mesh = make_mesh()
    if params is None:
        from mav_detection_tpu.models import pretrained

        params = pretrained.load_raft_params()
        if params is None:
            raise ValueError("no RAFT checkpoint found — pass params")
    if image1.shape[0] % mesh.shape[axis]:
        raise ValueError(
            f"image height {image1.shape[0]} must divide by the mesh axis "
            f"size {mesh.shape[axis]} (pad the frame or resize)")
    rows = NamedSharding(mesh, _P(axis))
    image1 = _jax.device_put(image1, rows)
    image2 = _jax.device_put(image2, rows)
    params = _jax.device_put(params, NamedSharding(mesh, _P()))
    return raft_flow(params, image1, image2, iters or PRODUCT_ITERS,
                     config=config)
