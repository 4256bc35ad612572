"""Farneback dense optical flow, TPU-native.

Re-derivation of Farneback's polynomial-expansion method (Farneback 2003,
"Two-frame motion estimation based on polynomial expansion") with the exact
numerical conventions OpenCV uses, so flow fields match
``cv2.calcOpticalFlowFarneback`` (the reference's flow spec:
``/root/reference/src/farneback.py:76-80`` — pyr_scale 0.4, levels 1,
winsize 12, 10 iterations, poly_n 8, poly_sigma 1.2).

Design notes (TPU-first):
* Polynomial expansion is two passes of separable 1-D correlations — lowered
  to precomputed banded-matrix matmuls so XLA tiles them onto the MXU
  (1-channel K-tap convs leave the 128x128 systolic array ~0% utilized).
* The whole solver carries an internal channel-last ``(h, w, B)`` layout:
  a batch of B frame pairs folds into the matmul FREE dimension
  ((H, H) @ (H, W*B*C)), which the MXU tiles as one wide matmul. vmap over
  a leading batch axis instead produces batched ``dot_general`` ops that
  tile ~1.7x WORSE (measured, PERF.md "Batching") — hence the explicit
  layout rather than ``jax.vmap``.
* The iterative update is warp + elementwise math + a box filter; everything
  stays on device under one jit, all shapes static, the iteration count a
  Python constant so the solver unrolls into one XLA program.
"""
from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@dataclass(frozen=True)
class FarnebackParams:
    pyr_scale: float = 0.4
    levels: int = 1
    winsize: int = 12
    iterations: int = 10
    poly_n: int = 8
    poly_sigma: float = 1.2
    # "highest" forces fp32 matmul passes (oracle-parity mode, EPE ~0.006
    # vs OpenCV); "default" lets the MXU run bf16 multiplies (~0.075 EPE,
    # still under the 0.1 px gate) for maximum throughput on TPU.
    precision: str = "highest"
    # fast=True refits the normal-equation matrices on a sparse schedule
    # ({0,1,2,4,7}) instead of every iteration. The per-pixel warp dominates
    # the runtime; halving the refit count keeps measured EPE vs the oracle
    # at ~0.003 px full-frame.
    fast: bool = False
    # warp selects the refit warp implementation:
    #   "gather"    — exact bilinear via XLA gather (any displacement).
    #   "separable" — two shifted-sum passes (see _warp_separable): ~4x
    #                 faster, exact for |displacement| <= max_shift up to a
    #                 negligible cross-term approximation on smooth flow.
    #   "pallas"    — band-tiled Pallas kernel fusing refit + box blur +
    #                 solve per iteration (farneback_pallas.py): working set
    #                 is batch-independent, refits run EVERY iteration (the
    #                 ``fast`` schedule is ignored — it exists only because
    #                 XLA refits are expensive).
    #   "auto"      — separable, with a data-dependent lax.cond fallback to
    #                 the exact gather whenever the current flow estimate
    #                 exceeds the separable warp's max_shift coverage.
    warp: str = "gather"
    max_shift: int = 16
    # Pallas row-band height (rounded up to a multiple of 8 inside the
    # kernel). Taller bands amortize the ±(max_shift+1+winsize/2) row halo
    # over more output rows but grow the VMEM working set; the sweet spot
    # depends on max_shift (see PERF.md "Pallas kernel tuning").
    band_rows: int = 8
    # Pallas halo layout: "stacked" pre-bands overlapping tiles in XLA every
    # iteration; "element" windows directly into edge-padded planes via
    # pl.Element starts (no per-iteration restack) — bit-exact with stacked
    # on real TPU (measured this round). "auto" picks element for batched
    # (channel-first) runs where it wins ~8% end-to-end and stacked for
    # batch-1 where XLA fuses the restack better (PERF.md "Element halo").
    pallas_halo: str = "auto"
    # Optional per-level iteration schedule, indexed by pyramid level
    # (0 = finest, matching cv2's k; levels beyond the tuple reuse its last
    # entry). Overrides ``iterations`` when set. The finest level dominates
    # cost (each coarser level is pyr_scale^2 of the area), so schedules
    # like (4, 8, 12) buy fine-level iterations back with cheap coarse ones
    # — the coarse levels hand the fine level a converged init (VERDICT r4
    # #7; hardware sweep in tools/iter_schedule_sweep.py / PERF.md).
    # Keyword-only in spirit: keep this LAST (callers construct positionally).
    level_iters: Optional[Tuple[int, ...]] = None


def tuned_flow_params(h: int, w: int) -> FarnebackParams:
    """Hardware-tuned Pallas product configuration, keyed by resolution
    (VERDICT r3 #1). Two measured operating points on TPU v5e:

    * <=752x480 (the bench/MIDGARD scale): max_shift=8 + 24-row bands — with
      pyramid init the per-refit residual stays inside +-8 px, halving the
      shift/select chain, and the small halo lets bands grow so it amortizes
      (PERF.md "Pallas kernel tuning": 7.48 -> 3.25 ms/frame, identical EPE).
    * 1920x1024 (the reference's native AirSim cameras,
      ``/root/reference/etc/settings.json:17-19``): the scene's motion is
      ~12 px at the finest level, past the +-8 px refit window, so
      ``max_shift=16`` (EPE vs analytic GT 0.486 px — within 2% of cv2's
      full-pyramid floor of 0.476 px on the same scene; ``max_shift=8``
      degrades to 0.83 px). The band/tile point comes from the v5e sweep
      (tools/hires_flow_sweep.py, PERF.md "Reference resolution"):
      band_rows=32 + element halo won (26.1 ms/frame batch-8, 38 fps/chip,
      ~106x the cv2-CPU baseline at this size) — wide frames column-tile
      (auto: 5 x 384 at S=16), so the halo cost scales with tiles and the
      optimum band is taller than at bench scale (the row halo amortizes
      over more tiles); band_rows=40's geometry exceeds the scoped-VMEM
      budget and 48 narrows tiles to 256 (column halo takes over, +8%).

    Interpolation rule: anything <= bench area uses the bench point, larger
    frames the hi-res point (both share levels=2 and the iteration schedule —
    convergence is resolution-independent; only the shift chain and tiling
    economics change).

    Iteration schedule (round 5, VERDICT r4 #7): ``level_iters=(2, 3, 8)``
    (finest-first) replaces flat 6 — the finest level owns ~76% of the cost
    and its late Jacobi sweeps over-smooth rather than converge (the same
    shape as RAFT's iters=6-beats-12 finding). Hardware sweep
    (tools/iter_schedule_sweep.py, PERF.md "Iteration schedule"):
    752x480 batch-8 2.72 -> 1.52 ms/frame (367 -> 660 fps/chip) at
    EPE-vs-cv2 0.0495 (gate <0.1) and EPE-vs-GT 0.3325 (BETTER than flat-6's
    0.3422); 1920x1024 26.1 -> 15.0 ms/frame (38 -> 67 fps/chip) at GT EPE
    0.4566 vs flat-6's 0.4858 — under cv2's own full-pyramid floor (0.4756).
    A 5-scene CPU screen (seeds x motion scales x sharp-texture shift) shows
    the schedule within +0.005 px of flat-6 vs the cv2 oracle everywhere and
    equal-or-better vs GT.
    """
    sched = (2, 3, 8)
    if h * w <= 480 * 752:
        return FarnebackParams(levels=2, pyr_scale=0.5, warp="pallas",
                               iterations=6, max_shift=8, band_rows=24,
                               level_iters=sched)
    return FarnebackParams(levels=2, pyr_scale=0.5, warp="pallas",
                           iterations=6, max_shift=16, band_rows=32,
                           level_iters=sched)


def effective_pallas_config(params: FarnebackParams, h: int, w: int,
                            batch: int) -> dict:
    """The kernel configuration that ACTUALLY lowers for this run — the
    requested ``pallas_halo``/tiling knobs are not always the effective ones
    ("auto" resolves by batch; unaligned explicit tiles demote element to
    stacked inside the kernel). bench.py ships these resolved values in its
    JSON so a benchmarked configuration is always identifiable
    (VERDICT r4 #10). Geometry is the finest pyramid level's (= the frame)."""
    from mav_detection_tpu.ops.flow.farneback_pallas import resolve_tiling

    if params.warp != "pallas":
        return {"warp": params.warp}
    requested = params.pallas_halo
    halo = requested
    if requested == "auto":
        # mirrors farneback_flow (batch-1 hwb path: stacked) vs
        # _farneback_cf (batch>=2 channel-first path: element)
        halo = "element" if batch >= 2 else "stacked"
    th, tw, nbands, nctiles, halo = resolve_tiling(
        h, w, band_rows=params.band_rows, max_shift=params.max_shift,
        winsize=params.winsize, halo=halo)
    return {"warp": "pallas", "halo": halo, "halo_requested": requested,
            "band_rows_effective": th, "tile_cols_effective": tw,
            "n_bands": nbands, "n_col_tiles": nctiles}


# ----------------------------------------------------------------- helpers
def _poly_exp_moments(n: int, sigma: float) -> Tuple[np.ndarray, np.ndarray, np.ndarray, float, float, float, float]:
    """Gaussian applicability weights and the inverse-moment constants.

    Solves the weighted least-squares normal equations for the 2-D basis
    {1, x, y, x^2, y^2, xy}; by symmetry only four inverse entries survive.
    """
    k = np.arange(-n, n + 1, dtype=np.float64)
    g = np.exp(-(k ** 2) / (2.0 * sigma ** 2))
    g /= g.sum()
    xg = k * g
    xxg = k ** 2 * g

    m2 = float((g * k ** 2).sum())
    m4 = float((g * k ** 4).sum())

    # G over (1, x^2, y^2) block and the diagonal x / y / xy entries.
    G3 = np.array(
        [
            [1.0, m2, m2],
            [m2, m4, m2 * m2],
            [m2, m2 * m2, m4],
        ]
    )
    invG3 = np.linalg.inv(G3)
    ig11 = 1.0 / m2
    ig03 = float(invG3[0, 1])
    ig33 = float(invG3[1, 1])
    ig55 = 1.0 / (m2 * m2)
    return g.astype(np.float32), xg.astype(np.float32), xxg.astype(np.float32), ig11, ig03, ig33, ig55


_PRECISION = {"highest": jax.lax.Precision.HIGHEST, "default": jax.lax.Precision.DEFAULT}

# --------------------------------------------------------------------------
# Separable correlations as banded-matrix matmuls.
#
# A 1-channel K-tap convolution is pathological on TPU: the MXU is a 128x128
# systolic array and C_in = C_out = 1 leaves it ~0.006% utilized (measured
# ~877 ms/frame at 752x480 with lax convs). Folding each 1-D correlation into
# a precomputed (H, H) / (W, W) banded matrix turns every pass into a dense
# matmul the MXU runs near peak — the band's zero entries waste FLOPs on
# paper but win >100x in wall clock. Border handling (replicate / reflect-101)
# folds into the band entries, so no padding ops remain in the hot path.
# --------------------------------------------------------------------------
_BAND_CACHE: dict = {}


def _band_matrix_np(size: int, kernel: Tuple[float, ...], mode: str) -> np.ndarray:
    """Host-side (size, size) matrix B with B @ x == correlate1d(x, kernel)."""
    key = (size, kernel, mode)
    cached = _BAND_CACHE.get(key)
    if cached is not None:
        return cached
    n = len(kernel) // 2
    B = np.zeros((size, size), np.float32)
    for i in range(size):
        for t, kv in enumerate(kernel):
            j = i + t - n
            if mode == "edge":
                j = min(max(j, 0), size - 1)
            elif mode == "reflect":  # reflect-101: -1 -> 1, size -> size-2
                if j < 0:
                    j = -j
                if j > size - 1:
                    j = 2 * (size - 1) - j
            B[i, j] += kv
    _BAND_CACHE[key] = B
    return B


def _band_matrix(size: int, kernel: Tuple[float, ...], mode: str) -> jax.Array:
    # NOTE: the cache holds numpy (trace-safe); jnp.asarray inside a trace
    # embeds the band as a compile-time constant.
    return jnp.asarray(_band_matrix_np(size, kernel, mode))


def _sep_correlate(img: jax.Array, kern_v: Tuple[float, ...],
                   kern_h: Tuple[float, ...], mode: str,
                   precision: str) -> jax.Array:
    """Separable 2-D correlation via two MXU matmuls. img may be (h, w) or
    (h, w, c) — channels fold into the matmul's free dimension."""
    h, w = img.shape[0], img.shape[1]
    prec = _PRECISION[precision]
    squeeze = img.ndim == 2
    x = img[..., None] if squeeze else img
    c = x.shape[-1]
    Bv = _band_matrix(h, kern_v, mode)
    Bh = _band_matrix(w, kern_h, mode)
    # vertical: (h, h) @ (h, w*c)
    y = jnp.dot(Bv, x.reshape(h, w * c), preferred_element_type=jnp.float32,
                precision=prec).reshape(h, w, c)
    # horizontal: (h*c, w) @ (w, w)^T
    y = jnp.dot(y.transpose(0, 2, 1).reshape(h * c, w), Bh.T,
                preferred_element_type=jnp.float32,
                precision=prec).reshape(h, c, w).transpose(0, 2, 1)
    return y[..., 0] if squeeze else y


def _sep_correlate_nd(img: jax.Array, kern_v: Tuple[float, ...],
                      kern_h: Tuple[float, ...], mode: str,
                      precision: str) -> jax.Array:
    """_sep_correlate for (h, w, *trailing) — trailing dims fold to channels."""
    if img.ndim <= 3:
        return _sep_correlate(img, kern_v, kern_h, mode, precision)
    h, w = img.shape[0], img.shape[1]
    trail = img.shape[2:]
    flat = _sep_correlate(img.reshape(h, w, int(np.prod(trail))),
                          kern_v, kern_h, mode, precision)
    return flat.reshape((h, w) + trail)


def _sep_correlate_cf(img: jax.Array, kern_v: Tuple[float, ...],
                      kern_h: Tuple[float, ...], mode: str,
                      precision: str) -> jax.Array:
    """Separable 2-D correlation on a channel-first ``(b, h, w)`` batch.

    The vertical contraction is an einsum over ``h`` (XLA folds ``b`` into
    the matmul free dimension); the horizontal pass contracts the trailing
    axis directly, so no layout change is ever materialized. This is the
    batched-Pallas preproc layout: the (h, w, b) path's output transposes
    cost ~0.13 ms/frame at batch 8 (tools/pipeline_stage_probe.py)."""
    prec = _PRECISION[precision]
    _, h, w = img.shape
    Bv = _band_matrix(h, kern_v, mode)
    Bh = _band_matrix(w, kern_h, mode)
    y = jnp.einsum("ih,bhw->biw", Bv, img,
                   preferred_element_type=jnp.float32, precision=prec)
    return jnp.einsum("bhw,wk->bhk", y, Bh.T,
                      preferred_element_type=jnp.float32, precision=prec)


def _correlate1d_h(img_hwb: jax.Array, kernels: Sequence[Tuple[float, ...]],
                   mode: str, precision: str) -> List[jax.Array]:
    """Horizontal 1-D correlations of an (h, w, b) image with several kernels
    at once: one (h*b, w) @ (w, k*w) matmul (kernels stack into the free dim)."""
    prec = _PRECISION[precision]
    h, w, b = img_hwb.shape
    Bh = jnp.concatenate([_band_matrix(w, k, mode).T for k in kernels], axis=1)
    x = img_hwb.transpose(0, 2, 1).reshape(h * b, w)
    y = jnp.dot(x, Bh, preferred_element_type=jnp.float32, precision=prec)
    return [y[:, i * w:(i + 1) * w].reshape(h, b, w).transpose(0, 2, 1)
            for i in range(len(kernels))]


def _gaussian_kernel(ksize: int, sigma: float) -> Tuple[float, ...]:
    if sigma <= 0:
        sigma = 0.3 * ((ksize - 1) * 0.5 - 1) + 0.8
    k = np.arange(ksize, dtype=np.float64) - (ksize - 1) / 2
    g = np.exp(-(k ** 2) / (2 * sigma ** 2))
    g /= g.sum()
    return tuple(float(v) for v in g)


def _gaussian_blur(img: jax.Array, ksize: int, sigma: float,
                   precision: str = "highest") -> jax.Array:
    """Separable Gaussian with OpenCV's sigma-from-ksize rule and
    reflect-101 borders (GaussianBlur defaults)."""
    g = _gaussian_kernel(ksize, sigma)
    return _sep_correlate_nd(img, g, g, "reflect", precision)


def _box_blur(img: jax.Array, winsize: int,
              precision: str = "highest") -> jax.Array:
    """Box filter with replicate borders, un-normalized window sum.

    The window is always symmetric with 2*(winsize//2)+1 taps — for an even
    ``winsize`` this sums one extra row/col while the caller still divides by
    winsize**2 (numerically verified against the oracle: even windows behave
    as an inflated symmetric sum, not an asymmetric one).

    Accepts (h, w) or (h, w, *trailing); trailing dims share the two matmuls.
    """
    m = winsize // 2
    ones = tuple([1.0] * (2 * m + 1))
    return _sep_correlate_nd(img, ones, ones, "edge", precision)


# ------------------------------------------------------------ core stages
def _poly_exp(img: jax.Array, n: int, sigma: float,
              precision: str = "highest") -> jax.Array:
    """Per-pixel quadratic fit: (h, w, b) -> (h, w, b, 5).

    Channel layout (matching the solver below):
      0: b_y (linear y), 1: b_x (linear x), 2: a_yy, 3: a_xx, 4: a_xy

    Batched frames ride the matmul free dimension: the vertical pass is one
    (3h, h) @ (h, w*b) matmul producing all three moments for every frame in
    the batch; the horizontal pass stacks kernels the same way.
    """
    g_np, xg_np, xxg_np, ig11, ig03, ig33, ig55 = _poly_exp_moments(n, sigma)
    g = tuple(float(v) for v in g_np)
    xg = tuple(float(v) for v in xg_np)
    xxg = tuple(float(v) for v in xxg_np)

    h, w, b = img.shape
    prec = _PRECISION[precision]
    # vertical pass: one stacked (3h, h) band matrix -> all three moments in
    # a single MXU matmul over the w*b free dimension.
    Bv = jnp.concatenate(
        [_band_matrix(h, g, "edge"), _band_matrix(h, xg, "edge"),
         _band_matrix(h, xxg, "edge")], axis=0)
    t = jnp.dot(Bv, img.reshape(h, w * b), preferred_element_type=jnp.float32,
                precision=prec)
    t0 = t[:h].reshape(h, w, b)
    t1 = t[h:2 * h].reshape(h, w, b)
    t2 = t[2 * h:].reshape(h, w, b)
    # horizontal pass (kernels stacked per input)
    b1, b2, b4 = _correlate1d_h(t0, [g, xg, xxg], "edge", precision)
    b3, b6 = _correlate1d_h(t1, [g, xg], "edge", precision)
    (b5,) = _correlate1d_h(t2, [g], "edge", precision)

    r0 = b3 * ig11
    r1 = b2 * ig11
    r2 = b1 * ig03 + b5 * ig33
    r3 = b1 * ig03 + b4 * ig33
    r4 = b6 * ig55
    return jnp.stack([r0, r1, r2, r3, r4], axis=-1)


def _poly_exp_cf(img: jax.Array, n: int, sigma: float,
                 precision: str = "highest") -> jax.Array:
    """Channel-first ``_poly_exp``: (b, h, w) -> (b, 5, h, w).

    Same moment math and channel layout as ``_poly_exp``; the layout differs
    so the Pallas iterate kernel's (b, 5, h, w) input needs no transpose.
    The vertical pass is one einsum against the stacked (3h, h) band matrix;
    the horizontal pass stacks kernels into one (w, Kw) matrix contracted
    over the trailing axis; channels assemble with a contiguous stack on
    axis 1 (cheap concat, not a transpose)."""
    g_np, xg_np, xxg_np, ig11, ig03, ig33, ig55 = _poly_exp_moments(n, sigma)
    g = tuple(float(v) for v in g_np)
    xg = tuple(float(v) for v in xg_np)
    xxg = tuple(float(v) for v in xxg_np)

    _, h, w = img.shape
    prec = _PRECISION[precision]
    Bv = jnp.concatenate(
        [_band_matrix(h, g, "edge"), _band_matrix(h, xg, "edge"),
         _band_matrix(h, xxg, "edge")], axis=0)
    t = jnp.einsum("ih,bhw->biw", Bv, img,
                   preferred_element_type=jnp.float32, precision=prec)
    t0, t1, t2 = t[:, :h], t[:, h:2 * h], t[:, 2 * h:]

    def hpass(x: jax.Array, kernels: Sequence[Tuple[float, ...]]) -> List[jax.Array]:
        Bh = jnp.concatenate([_band_matrix(w, k, "edge").T for k in kernels],
                             axis=1)
        y = jnp.einsum("bhw,wk->bhk", x, Bh,
                       preferred_element_type=jnp.float32, precision=prec)
        return [y[..., i * w:(i + 1) * w] for i in range(len(kernels))]

    b1, b2, b4 = hpass(t0, [g, xg, xxg])
    b3, b6 = hpass(t1, [g, xg])
    (b5,) = hpass(t2, [g])

    return jnp.stack([b3 * ig11, b2 * ig11, b1 * ig03 + b5 * ig33,
                      b1 * ig03 + b4 * ig33, b6 * ig55], axis=1)


@functools.lru_cache(maxsize=None)
def _resize_matrix_np(src: int, dst: int) -> np.ndarray:
    """(dst, src) dense matrix M with M @ x == jax.image.resize(x, dst,
    "linear") along one axis: triangle kernel on half-pixel sample points
    with antialiasing on downscale, edge weights renormalized — numpy
    re-statement of jax's ``compute_weight_mat`` (pure numpy so the fused
    pyramid matrices can build inside a trace; equality with the op is
    pinned by ``test_resize_matrix_matches_jax_image_resize``)."""
    if src == dst:
        return np.eye(src, dtype=np.float64)
    inv_scale = src / dst
    kernel_scale = max(inv_scale, 1.0)  # antialias widens on downscale
    sample_f = (np.arange(dst, dtype=np.float64) + 0.5) * inv_scale - 0.5
    x = np.abs(sample_f[np.newaxis, :]
               - np.arange(src, dtype=np.float64)[:, np.newaxis]) / kernel_scale
    weights = np.maximum(0.0, 1.0 - x)  # triangle
    total = weights.sum(axis=0, keepdims=True)
    weights = np.where(np.abs(total) > 1000.0 * np.finfo(np.float32).eps,
                       weights / np.where(total != 0, total, 1), 0.0)
    valid = (sample_f >= -0.5) & (sample_f <= src - 0.5)
    return np.where(valid[np.newaxis, :], weights, 0.0).T


@functools.lru_cache(maxsize=None)
def _poly_pyr_mats_np(h: int, w: int, lh: int, lw: int,
                      smooth: Tuple[float, ...], n: int,
                      sigma: float) -> Tuple[np.ndarray, np.ndarray]:
    """Fused per-layer preproc matrices: Gaussian smooth -> linear resize ->
    polynomial-expansion moment correlations, composed in f64.

    Returns (V, Hm): V (3*lh, h) applies blur+resize+all three vertical
    moment kernels in one matmul; Hm (w, 3*lw) = [Wg | Wxg | Wxxg] applies
    blur+resize+one horizontal moment kernel per lw-column block (slice
    [:, :k*lw] for the moments a given vertical slice needs)."""
    g_np, xg_np, xxg_np, *_ = _poly_exp_moments(n, sigma)
    g = tuple(float(v) for v in g_np)
    xg = tuple(float(v) for v in xg_np)
    xxg = tuple(float(v) for v in xxg_np)

    pre_v = _resize_matrix_np(h, lh) @ _band_matrix_np(h, smooth, "reflect")
    V = np.concatenate(
        [_band_matrix_np(lh, g, "edge"), _band_matrix_np(lh, xg, "edge"),
         _band_matrix_np(lh, xxg, "edge")], axis=0) @ pre_v

    pre_h = _band_matrix_np(w, smooth, "reflect").T @ _resize_matrix_np(w, lw).T
    Hm = np.concatenate(
        [pre_h @ _band_matrix_np(lw, k, "edge").T for k in (g, xg, xxg)],
        axis=1)
    return V.astype(np.float32), Hm.astype(np.float32)


def _poly_exp_pyr_cf(img: jax.Array, smooth: Tuple[float, ...], lh: int,
                     lw: int, n: int, sigma: float,
                     precision: str = "highest") -> jax.Array:
    """Fused smooth+resize+poly_exp for one pyramid layer, channel-first:
    (b, h, w) full-resolution frames -> (b, 5, lh, lw) coefficients.

    The per-layer Gaussian smooth, the linear resize, and the moment
    correlations of ``_poly_exp_cf`` are all linear per axis, so they
    compose into ONE (3*lh, h) left matrix and ONE (w, 3*lw) right matrix —
    two matmul passes per layer with no full-resolution intermediates
    (the unfused chain's blur/resize materializations were the residual
    batching cost, tools/pipeline_stage_probe.py)."""
    _, _, _, ig11, ig03, ig33, ig55 = _poly_exp_moments(n, sigma)
    _, h, w = img.shape
    prec = _PRECISION[precision]
    V_np, Hm_np = _poly_pyr_mats_np(h, w, lh, lw, smooth, n, sigma)
    V = jnp.asarray(V_np)
    Hm = jnp.asarray(Hm_np)

    t = jnp.einsum("ih,bhw->biw", V, img,
                   preferred_element_type=jnp.float32, precision=prec)
    t0, t1, t2 = t[:, :lh], t[:, lh:2 * lh], t[:, 2 * lh:]
    y0 = jnp.einsum("bhw,wk->bhk", t0, Hm,
                    preferred_element_type=jnp.float32, precision=prec)
    y1 = jnp.einsum("bhw,wk->bhk", t1, Hm[:, :2 * lw],
                    preferred_element_type=jnp.float32, precision=prec)
    b5 = jnp.einsum("bhw,wk->bhk", t2, Hm[:, :lw],
                    preferred_element_type=jnp.float32, precision=prec)
    b1, b2, b4 = y0[..., :lw], y0[..., lw:2 * lw], y0[..., 2 * lw:]
    b3, b6 = y1[..., :lw], y1[..., lw:]

    return jnp.stack([b3 * ig11, b2 * ig11, b1 * ig03 + b5 * ig33,
                      b1 * ig03 + b4 * ig33, b6 * ig55], axis=1)


_BORDER_SCALES = (0.14, 0.14, 0.4472, 0.4472, 0.4472)


def _border_scale_map(h: int, w: int) -> jax.Array:
    """Downweighting of constraints near image borders (5-px ramp)."""
    ramp = np.array(_BORDER_SCALES, np.float32)
    b = len(ramp)

    def axis_scale(nn: int) -> np.ndarray:
        a = np.ones(nn, np.float32)
        a[:b] *= ramp
        a[nn - b:] *= ramp[::-1][-min(b, nn):]
        return a

    return jnp.asarray(axis_scale(h)[:, None] * axis_scale(w)[None, :])


def _warp_gather(R1: jax.Array, fx, fy, x1, y1, h: int, w: int) -> jax.Array:
    """Exact bilinear warp via XLA gather (4 taps).

    R1 is (h, w, b, c); fx/fy/x1/y1 are (h, w, b) per-frame coordinates."""
    b = R1.shape[2]
    bi = jax.lax.broadcasted_iota(jnp.int32, (1, 1, b), 2)
    x1i = jnp.clip(x1, 0, w - 1).astype(jnp.int32)
    y1i = jnp.clip(y1, 0, h - 1).astype(jnp.int32)
    x2i = jnp.minimum(x1i + 1, w - 1)
    y2i = jnp.minimum(y1i + 1, h - 1)
    a00 = (1 - fx) * (1 - fy)
    a01 = fx * (1 - fy)
    a10 = (1 - fx) * fy
    a11 = fx * fy
    return (a00[..., None] * R1[y1i, x1i, bi]
            + a01[..., None] * R1[y1i, x2i, bi]
            + a10[..., None] * R1[y2i, x1i, bi]
            + a11[..., None] * R1[y2i, x2i, bi])


def _warp_separable(R1: jax.Array, fx, fy, x1, y1, h: int, w: int,
                    max_shift: int) -> jax.Array:
    """Approximate bilinear warp as two shifted-sum passes (no gather).

    Exact per stage with each output pixel's own fractional weights; the
    cross term differs from true bilinear only where the OTHER axis's integer
    displacement changes between neighboring pixels — negligible for the
    box-smoothed flow fields the Farneback solver produces (measured effect
    on final flow: <1e-2 px EPE). Displacements are clamped to
    ±``max_shift``; larger true motion needs the gather path or a pyramid.

    The VPU cost is 2*(2*max_shift+2) streaming passes, ~4x faster than the
    TPU gather at max_shift=16. R1 is (h, w, b, c); batches stream through
    the same shifted passes (cost scales linearly in b, still VPU-bound).
    """
    S = max_shift
    row = jax.lax.broadcasted_iota(jnp.float32, (h, w, 1), 0)
    col = jax.lax.broadcasted_iota(jnp.float32, (h, w, 1), 1)
    sy = jnp.clip(y1 - row, -S, S).astype(jnp.int32)
    sx = jnp.clip(x1 - col, -S, S).astype(jnp.int32)

    # y-stage: A(y, x) = (1-fy) R1[y+sy, x] + fy R1[y+sy+1, x]
    Rp = jnp.concatenate([jnp.repeat(R1[:1], S + 1, 0), R1,
                          jnp.repeat(R1[-1:], S + 1, 0)], axis=0)
    A = jnp.zeros_like(R1)
    for s in range(-S, S + 2):
        wgt = (jnp.where(sy == s, 1.0 - fy, 0.0)
               + jnp.where(sy == s - 1, fy, 0.0))
        A = A + wgt[..., None] * jax.lax.dynamic_slice_in_dim(Rp, s + S + 1, h, 0)
    # x-stage on A
    Ap = jnp.concatenate([jnp.repeat(A[:, :1], S + 1, 1), A,
                          jnp.repeat(A[:, -1:], S + 1, 1)], axis=1)
    out = jnp.zeros_like(R1)
    for s in range(-S, S + 2):
        wgt = (jnp.where(sx == s, 1.0 - fx, 0.0)
               + jnp.where(sx == s - 1, fx, 0.0))
        out = out + wgt[..., None] * jax.lax.dynamic_slice_in_dim(Ap, s + S + 1, w, 1)
    return out


def _update_matrices(R0: jax.Array, R1: jax.Array, flow: jax.Array,
                     border: jax.Array, warp: str = "gather",
                     max_shift: int = 16, row0=None,
                     global_h: int = 0) -> jax.Array:
    """Per-pixel normal-equation entries M = [G11, G12, G22, h1, h2].

    All arrays carry the (h, w, b, ...) layout: R0/R1 (h, w, b, 5),
    flow (h, w, b, 2), border (h, w).

    ``row0``/``global_h`` support the row-sharded spatial path
    (parallel/spatial.py): when the arrays are a haloed row SLAB of a larger
    image, ``row0`` is the slab's first global row (may be a traced scalar)
    and ``global_h`` the full image height — the inside-image gate then uses
    GLOBAL coordinates so slab edges are not mistaken for image edges."""
    h, w = flow.shape[:2]
    xs = jax.lax.broadcasted_iota(jnp.float32, (h, w, 1), 1)
    ys = jax.lax.broadcasted_iota(jnp.float32, (h, w, 1), 0)
    dx = flow[..., 0]
    dy = flow[..., 1]
    fx = xs + dx
    fy = ys + dy
    x1 = jnp.floor(fx)
    y1 = jnp.floor(fy)
    fx = fx - x1
    fy = fy - y1
    if row0 is not None:
        y1g = y1 + row0
        inside = (x1 >= 0) & (x1 < w - 1) & (y1g >= 0) & (y1g < global_h - 1)
    else:
        inside = (x1 >= 0) & (x1 < w - 1) & (y1 >= 0) & (y1 < h - 1)
    fx = jnp.where(inside, fx, 0.0)
    fy = jnp.where(inside, fy, 0.0)
    if warp == "separable":
        r = _warp_separable(R1, fx, fy, x1, y1, h, w, max_shift)
    elif warp == "auto":
        # Exactness guard: the separable warp covers |displacement| <=
        # max_shift - 1 (one extra tap for the fractional neighbor). When the
        # current flow estimate exceeds that anywhere, fall back to the exact
        # gather for THIS refit. Both branches compile; only one runs.
        max_disp = jnp.max(jnp.abs(flow))
        r = jax.lax.cond(
            max_disp <= float(max_shift - 1),
            lambda: _warp_separable(R1, fx, fy, x1, y1, h, w, max_shift),
            lambda: _warp_gather(R1, fx, fy, x1, y1, h, w),
        )
    else:
        r = _warp_gather(R1, fx, fy, x1, y1, h, w)

    r4 = (R0[..., 2] + r[..., 2]) * 0.5
    r5 = (R0[..., 3] + r[..., 3]) * 0.5
    r6 = (R0[..., 4] + r[..., 4]) * 0.25
    r2 = (R0[..., 0] - r[..., 0]) * 0.5
    r3 = (R0[..., 1] - r[..., 1]) * 0.5
    r2 = r2 + r4 * dy + r6 * dx
    r3 = r3 + r6 * dy + r5 * dx

    bmap = border[..., None]
    r2 = r2 * bmap
    r3 = r3 * bmap
    r4 = r4 * bmap
    r5 = r5 * bmap
    r6 = r6 * bmap

    m0 = r4 * r4 + r6 * r6
    m1 = (r4 + r5) * r6
    m2 = r5 * r5 + r6 * r6
    m3 = r4 * r2 + r6 * r3
    m4 = r6 * r2 + r5 * r3
    return jnp.stack([m0, m1, m2, m3, m4], axis=-1)


def _solve_flow(M: jax.Array, winsize: int,
                precision: str = "highest") -> jax.Array:
    # Window-mean normalization matters: the 1e-3 determinant regularizer
    # below acts on *normalized* sums, so it damps the solution by a fixed,
    # window-independent amount (this is what makes the solver's fixed point
    # slightly shrink large displacements — intentional parity behavior).
    scale = 1.0 / (winsize * winsize)
    Mb = _box_blur(M, winsize, precision) * scale  # (h, w, b, 5), 2 matmuls
    g11, g12, g22, h1, h2 = (Mb[..., i] for i in range(5))
    idet = 1.0 / (g11 * g22 - g12 * g12 + 1e-3)
    dx = (g11 * h2 - g12 * h1) * idet
    dy = (g22 * h1 - g12 * h2) * idet
    return jnp.stack([dx, dy], axis=-1)


def _resize_linear(img: jax.Array, shape: Tuple[int, int]) -> jax.Array:
    return jax.image.resize(img, shape + img.shape[2:], method="linear")


def _resize_linear_cf(img: jax.Array, shape: Tuple[int, int]) -> jax.Array:
    """Linear resize of the TRAILING two (spatial) dims: (..., h, w)."""
    return jax.image.resize(img, img.shape[:-2] + shape, method="linear")


# --------------------------------------------------------------- top level
def _pyramid_scales(h: int, w: int, params: "FarnebackParams") -> List[float]:
    # cv2 semantics (farneback.cpp iterates k = levels..0): ``levels`` is the
    # number of EXTRA coarse layers on top of the original image, so N+1
    # layers total. Verified empirically: cv2 levels=0 diverges on a 5 px
    # sharp-texture scene where levels=1 converges — the documented
    # "levels=1 means no extra layers" is wrong about cv2's own code, and a
    # same-number drop-in must reproduce cv2's behavior.
    # Cap so coarse layers keep enough pixels for the poly window.
    scales = [1.0]
    for k_level in range(1, params.levels + 1):
        scale = params.pyr_scale ** k_level
        if min(h, w) * scale < 2 * params.poly_n + 1:
            break
        scales.append(scale)
    return scales


def _farneback_hwb(prev: jax.Array, curr: jax.Array,
                   params: FarnebackParams) -> jax.Array:
    """Core solver over channel-last batches: (h, w, b) x2 -> (h, w, b, 2).

    Matches cv2.calcOpticalFlowFarneback(flags=0): coarse-to-fine over
    ``levels`` pyramid layers, each layer running ``iterations`` rounds of
    (box-blur normal equations -> 2x2 solve -> refit matrices).
    """
    if params.warp not in ("gather", "separable", "pallas", "auto"):
        raise ValueError(
            f"warp={params.warp!r} is not valid, has to be 'gather', "
            f"'separable', 'pallas' or 'auto'")
    if params.precision not in _PRECISION:
        raise ValueError(
            f"precision={params.precision!r} is not valid, has to be one of "
            f"{sorted(_PRECISION)}")
    prev = prev.astype(jnp.float32)
    curr = curr.astype(jnp.float32)
    h, w, b = prev.shape

    scales = _pyramid_scales(h, w, params)

    flow = None
    for k_level in reversed(range(len(scales))):
        scale = scales[k_level]
        sigma = (1.0 / scale - 1.0) * 0.5
        smooth_sz = max(int(round(sigma * 5)) | 1, 3)
        lh, lw = int(round(h * scale)), int(round(w * scale))

        i0 = _resize_linear(_gaussian_blur(prev, smooth_sz, sigma, params.precision), (lh, lw))
        i1 = _resize_linear(_gaussian_blur(curr, smooth_sz, sigma, params.precision), (lh, lw))

        if flow is None:
            flow = jnp.zeros((lh, lw, b, 2), jnp.float32)
        else:
            flow = _resize_linear(flow, (lh, lw)) * (1.0 / params.pyr_scale)

        R0 = _poly_exp(i0, params.poly_n, params.poly_sigma, params.precision)
        R1 = _poly_exp(i1, params.poly_n, params.poly_sigma, params.precision)
        border = _border_scale_map(lh, lw)

        if params.warp == "pallas":
            from mav_detection_tpu.ops.flow.farneback_pallas import (
                farneback_iterate_pallas)

            flow_cf = farneback_iterate_pallas(
                jnp.transpose(R0, (2, 3, 0, 1)),
                jnp.transpose(R1, (2, 3, 0, 1)),
                jnp.transpose(flow, (2, 3, 0, 1)), border,
                iterations=_level_iter_count(params, k_level),
                winsize=params.winsize,
                max_shift=params.max_shift, band_rows=params.band_rows,
                # auto: stacked — this path serves batch 1 (batches go
                # through _farneback_cf), where XLA fuses the restack better
                # than the per-iteration edge-pad (PERF.md "Element halo")
                halo=("stacked" if params.pallas_halo == "auto"
                      else params.pallas_halo),
                interpret=jax.default_backend() == "cpu")
            flow = jnp.transpose(flow_cf, (2, 3, 0, 1))
            continue

        flow = _jacobi_level(R0, R1, flow, border, params,
                             iterations=_level_iter_count(params, k_level))

    return flow


def _level_iter_count(params: "FarnebackParams", k_level: int) -> int:
    """Iteration count for pyramid level ``k_level`` (0 = finest): the
    ``level_iters`` schedule when set (clamped to its last entry for deeper
    levels), else the flat ``iterations``."""
    if not params.level_iters:
        return params.iterations
    li = params.level_iters
    return li[min(k_level, len(li) - 1)]


def _refit_schedule(params: "FarnebackParams",
                    iterations: Optional[int] = None) -> set:
    """Iterations after which the normal-equation matrices are refit.
    ``fast`` thins the schedule (PERF.md: the warp dominates; halving refits
    costs ~0.003 px EPE vs the oracle)."""
    n = params.iterations if iterations is None else iterations
    if params.fast:
        return {0, 1, 2, 4, 7} & set(range(n - 1))
    return set(range(n - 1))


def _jacobi_level(R0: jax.Array, R1: jax.Array, flow: jax.Array,
                  border: jax.Array, params: "FarnebackParams",
                  warp: Optional[str] = None,
                  iterations: Optional[int] = None) -> jax.Array:
    """One pyramid level's iterate/refit loop (XLA warp paths).

    Jacobi-style iteration: solve everywhere, then refit everywhere. The
    oracle implementation does a row-sequential Gauss-Seidel sweep (updated
    matrices feed later rows within one pass), which converges in fewer
    passes but serializes rows — a poor fit for a vector unit. Both schemes
    share the same fixed point; at the reference's 10 iterations the fields
    agree to <0.01 px EPE. Shared with the row-sharded spatial engine's
    replicated coarse levels (parallel/spatial.py) so the refit schedule
    cannot drift between them."""
    warp = warp or params.warp
    n = params.iterations if iterations is None else iterations
    um_iters = _refit_schedule(params, n)
    M = _update_matrices(R0, R1, flow, border, warp, params.max_shift)
    for it in range(n):
        flow = _solve_flow(M, params.winsize, params.precision)
        if it in um_iters:
            M = _update_matrices(R0, R1, flow, border, warp,
                                 params.max_shift)
    return flow


def _farneback_cf(prev: jax.Array, curr: jax.Array,
                  params: FarnebackParams) -> jax.Array:
    """Channel-first batched solver for the Pallas warp: (b, h, w) x2 ->
    (b, h, w, 2).

    Same layer loop as ``_farneback_hwb`` but every array stays in the
    Pallas kernel's native (b, [c,] h, w) layout — no (h, w, b, 5) ->
    (b, 5, h, w) transposes. At batch 1 XLA folds the hwb path's transposes
    into matmul output layouts so hwb wins; at batch >= 2 it cannot, and the
    transposes became the entire end-to-end batching deficit (measured:
    tools/pipeline_stage_probe.py — preproc residual 0.31 -> 0.57 ms/frame
    from b=1 to b=8 while the iterate kernel stayed batch-neutral)."""
    from mav_detection_tpu.ops.flow.farneback_pallas import (
        farneback_iterate_pallas)

    prev = prev.astype(jnp.float32)
    curr = curr.astype(jnp.float32)
    _, h, w = prev.shape
    interpret = jax.default_backend() == "cpu"

    flow = None
    scales = _pyramid_scales(h, w, params)
    for k_level in reversed(range(len(scales))):
        scale = scales[k_level]
        sigma = (1.0 / scale - 1.0) * 0.5
        smooth_sz = max(int(round(sigma * 5)) | 1, 3)
        lh, lw = int(round(h * scale)), int(round(w * scale))

        if flow is None:
            flow = jnp.zeros((prev.shape[0], 2, lh, lw), jnp.float32)
        else:
            flow = _resize_linear_cf(flow, (lh, lw)) * (1.0 / params.pyr_scale)

        smooth = _gaussian_kernel(smooth_sz, sigma)
        R0 = _poly_exp_pyr_cf(prev, smooth, lh, lw, params.poly_n,
                              params.poly_sigma, params.precision)
        R1 = _poly_exp_pyr_cf(curr, smooth, lh, lw, params.poly_n,
                              params.poly_sigma, params.precision)
        border = _border_scale_map(lh, lw)

        flow = farneback_iterate_pallas(
            R0, R1, flow, border,
            iterations=_level_iter_count(params, k_level),
            winsize=params.winsize, max_shift=params.max_shift,
            band_rows=params.band_rows,
            # auto: element — at batch >= 2 the pl.Element windows beat the
            # per-iteration restack ~8% end-to-end, bit-exact (PERF.md
            # "Element halo"); wide frames column-tile with lane-aligned
            # Element windows (only an unaligned explicit tile_cols falls
            # back to stacked inside the kernel entry)
            halo=("element" if params.pallas_halo == "auto"
                  else params.pallas_halo),
            interpret=interpret)

    return jnp.transpose(flow, (0, 2, 3, 1))


@functools.partial(jax.jit, static_argnames=("params",))
def farneback_flow(prev: jax.Array, curr: jax.Array,
                   params: FarnebackParams = FarnebackParams()) -> jax.Array:
    """Dense flow from ``prev`` to ``curr`` (grayscale (h, w)), returns (h, w, 2)."""
    return _farneback_hwb(prev[..., None], curr[..., None], params)[:, :, 0]


@functools.partial(jax.jit, static_argnames=("params",))
def farneback_flow_batch(prev: jax.Array, curr: jax.Array,
                         params: FarnebackParams = FarnebackParams()) -> jax.Array:
    """Batched variant: (n, h, w) x2 -> (n, h, w, 2).

    The batch folds into the matmul free dimension (channel-last internal
    layout), NOT a vmap — measured 1.7x faster at batch=8 than the batched
    dot_general tiling vmap produces (PERF.md "Batching"). The Pallas warp
    at batch >= 2 instead runs the channel-first pipeline (``_farneback_cf``)
    whose preproc needs no layout transposes at all."""
    if params.warp == "pallas" and prev.shape[0] > 1:
        return _farneback_cf(prev, curr, params)
    flow = _farneback_hwb(prev.transpose(1, 2, 0), curr.transpose(1, 2, 0),
                          params)
    return flow.transpose(2, 0, 1, 3)
