"""Sparse optical flow: Shi-Tomasi corners + pyramidal Lucas-Kanade.

TPU-native replacement for the reference's OpenCV wrappers
(``/root/reference/src/lucas_kanade.py:22-29,53-60``): maxCorners 2000,
quality 0.2, minDistance 7, block 7; LK window 21x21, 30 iterations, eps 0.01.

Design notes:
* Corner response (min eigenvalue of the structure tensor) uses the banded
  matmul correlators from the Farneback module — all MXU work.
* Feature selection is fixed-shape: top-K by response after max-pool NMS,
  invalid slots carry a validity mask instead of a ragged array.
* Tracking vmaps the iterative solver over the feature axis; each feature's
  21x21 window gathers are batched into one big gather per iteration.
"""
from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from mav_detection_tpu.ops.flow.farneback import _sep_correlate


class Corners(NamedTuple):
    points: jax.Array   # (K, 2) float32 (x, y)
    valid: jax.Array    # (K,) bool
    response: jax.Array # (K,) float32


class TrackResult(NamedTuple):
    points: jax.Array   # (K, 2) tracked positions
    status: jax.Array   # (K,) bool — tracked successfully
    error: jax.Array    # (K,) mean abs residual in the window


_SOBEL_D = (-1.0, 0.0, 1.0)
_SOBEL_S = (1.0, 2.0, 1.0)


def _gradients(img: jax.Array, precision: str = "highest") -> Tuple[jax.Array, jax.Array]:
    """Sobel x/y gradients with the 1/8 normalization cv2 effectively uses
    for cornerMinEigenVal (aperture 3, scale handled by response norm)."""
    gx = _sep_correlate(img, _SOBEL_S, _SOBEL_D, "edge", precision)
    gy = _sep_correlate(img, _SOBEL_D, _SOBEL_S, "edge", precision)
    return gx, gy


@functools.partial(jax.jit, static_argnames=("max_corners", "block_size", "min_distance"))
def shi_tomasi_corners(
    img: jax.Array,
    max_corners: int = 2000,
    quality_level: float = 0.2,
    min_distance: int = 7,
    block_size: int = 7,
) -> Corners:
    """Good-features-to-track: min-eigenvalue response, quality gate, NMS,
    fixed-K top-k selection."""
    x = img.astype(jnp.float32)
    gx, gy = _gradients(x)
    box = tuple([1.0] * block_size)
    # structure tensor components summed over the block window
    sxx = _sep_correlate(gx * gx, box, box, "edge", "highest")
    syy = _sep_correlate(gy * gy, box, box, "edge", "highest")
    sxy = _sep_correlate(gx * gy, box, box, "edge", "highest")
    # min eigenvalue of [[sxx, sxy], [sxy, syy]]
    tr = (sxx + syy) * 0.5
    det_part = jnp.sqrt(((sxx - syy) * 0.5) ** 2 + sxy ** 2)
    response = tr - det_part

    h, w = x.shape
    # suppress borders (gradient support)
    b = max(block_size // 2, 1) + 1
    ys = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    xs = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    interior = (ys >= b) & (ys < h - b) & (xs >= b) & (xs < w - b)
    response = jnp.where(interior, response, 0.0)

    # quality gate relative to the global max
    gate = quality_level * jnp.max(response)
    response = jnp.where(response >= gate, response, 0.0)

    # cv2 scheme: 3x3 local-max NMS, then a greedy min-distance sweep over
    # candidates in descending response order.
    pooled = jax.lax.reduce_window(
        response, -jnp.inf, jax.lax.max, (3, 3), (1, 1), "SAME")
    is_peak = (response == pooled) & (response > 0.0)
    masked = jnp.where(is_peak, response, 0.0)

    n_cand = min(4 * max_corners, h * w)
    flat = masked.reshape(-1)
    vals, idx = jax.lax.top_k(flat, n_cand)
    cand = jnp.stack([(idx % w).astype(jnp.float32),
                      (idx // w).astype(jnp.float32)], axis=1)
    cand_ok = vals > 0.0

    min_d2 = jnp.float32(min_distance * min_distance)

    def greedy(i, state):
        accepted_mask, count = state
        d2 = jnp.sum((cand - cand[i]) ** 2, axis=1)
        # conflict with an already-accepted, earlier, distinct candidate
        conflict = jnp.any(accepted_mask & (d2 < min_d2)
                           & (jnp.arange(n_cand) != i))
        take = cand_ok[i] & ~conflict & (count < max_corners)
        return accepted_mask.at[i].set(take), count + take.astype(jnp.int32)

    accepted, _ = jax.lax.fori_loop(
        0, n_cand, greedy, (jnp.zeros(n_cand, bool), jnp.int32(0)))

    # compact accepted candidates into the first max_corners slots
    order = jnp.argsort(~accepted, stable=True)  # accepted first, by response
    top = order[:max_corners]
    pts = cand[top]
    valid = accepted[top]
    resp = jnp.where(valid, vals[top], 0.0)
    return Corners(points=pts, valid=valid, response=resp)


def _pyr_down(img: jax.Array) -> jax.Array:
    """cv2.pyrDown: 5-tap Gaussian [1,4,6,4,1]/16 then 2x decimation."""
    k = (1 / 16.0, 4 / 16.0, 6 / 16.0, 4 / 16.0, 1 / 16.0)
    sm = _sep_correlate(img, k, k, "reflect", "highest")
    return sm[::2, ::2]


def _bilinear_patch(img: jax.Array, center: jax.Array, half: int) -> jax.Array:
    """Sample a (2*half+1)^2 window around float ``center`` (x, y)."""
    size = 2 * half + 1
    h, w = img.shape
    ox = jnp.arange(-half, half + 1, dtype=jnp.float32)
    gx = center[0] + ox[None, :]
    gy = center[1] + ox[:, None]
    gx = jnp.broadcast_to(gx, (size, size))
    gy = jnp.broadcast_to(gy, (size, size))
    x0 = jnp.floor(gx)
    y0 = jnp.floor(gy)
    fx = gx - x0
    fy = gy - y0
    x0i = jnp.clip(x0, 0, w - 1).astype(jnp.int32)
    y0i = jnp.clip(y0, 0, h - 1).astype(jnp.int32)
    x1i = jnp.minimum(x0i + 1, w - 1)
    y1i = jnp.minimum(y0i + 1, h - 1)
    return ((1 - fx) * (1 - fy) * img[y0i, x0i]
            + fx * (1 - fy) * img[y0i, x1i]
            + (1 - fx) * fy * img[y1i, x0i]
            + fx * fy * img[y1i, x1i])


@functools.partial(jax.jit, static_argnames=("win", "iters", "levels"))
def lucas_kanade_track(
    img0: jax.Array,
    img1: jax.Array,
    points: jax.Array,
    win: int = 21,
    iters: int = 30,
    eps: float = 0.01,
    levels: int = 3,
) -> TrackResult:
    """Track ``points`` ((K, 2) float (x, y)) from img0 to img1.

    Pyramidal coarse-to-fine iterative LK with bilinear window sampling and
    the standard 2x2 normal-equation solve per feature per iteration.
    """
    i0 = img0.astype(jnp.float32)
    i1 = img1.astype(jnp.float32)
    half = win // 2

    pyr0 = [i0]
    pyr1 = [i1]
    for _ in range(levels - 1):
        pyr0.append(_pyr_down(pyr0[-1]))
        pyr1.append(_pyr_down(pyr1[-1]))

    k = points.shape[0]
    d = jnp.zeros((k, 2), jnp.float32)

    status = jnp.ones((k,), bool)
    err = jnp.zeros((k,), jnp.float32)

    for lvl in reversed(range(levels)):
        scale = 2.0 ** lvl
        p_lvl = points / scale
        a0, a1 = pyr0[lvl], pyr1[lvl]
        gx_img, gy_img = _gradients(a0)
        gx_img = gx_img * 0.25  # Sobel -> central-difference scale
        gy_img = gy_img * 0.25

        def track_one(p, d_init):
            patch0 = _bilinear_patch(a0, p, half)
            gx = _bilinear_patch(gx_img, p, half)
            gy = _bilinear_patch(gy_img, p, half)
            g00 = jnp.sum(gx * gx)
            g01 = jnp.sum(gx * gy)
            g11 = jnp.sum(gy * gy)
            det = g00 * g11 - g01 * g01
            ok = det > 1e-6
            inv_det = jnp.where(ok, 1.0 / jnp.maximum(det, 1e-12), 0.0)

            def body(carry):
                dd, it, delta = carry
                patch1 = _bilinear_patch(a1, p + dd, half)
                diff = patch1 - patch0
                b0 = jnp.sum(diff * gx)
                b1 = jnp.sum(diff * gy)
                step = jnp.stack([
                    -(g11 * b0 - g01 * b1) * inv_det,
                    -(g00 * b1 - g01 * b0) * inv_det,
                ])
                return dd + step, it + 1, jnp.linalg.norm(step)

            def cond(carry):
                _, it, delta = carry
                return (it < iters) & (delta >= eps)

            dd, _, _ = jax.lax.while_loop(cond, body, (d_init, 0, jnp.float32(1e9)))
            patch1 = _bilinear_patch(a1, p + dd, half)
            residual = jnp.mean(jnp.abs(patch1 - patch0))
            return dd, ok, residual

        d, lvl_ok, err = jax.vmap(track_one)(p_lvl, d)
        status = status & lvl_ok
        if lvl > 0:
            d = d * 2.0

    new_points = points + d
    h, w = i0.shape
    inside = ((new_points[:, 0] >= 0) & (new_points[:, 0] <= w - 1)
              & (new_points[:, 1] >= 0) & (new_points[:, 1] <= h - 1))
    return TrackResult(points=new_points, status=status & inside, error=err)


class FeaturePool(NamedTuple):
    """Fixed-capacity feature pool replacing the reference's grow/shrink list
    (``lucas_kanade.py:51-56``): slots below the replenish floor trigger a
    re-detection that fills invalid slots, shapes never change."""
    points: jax.Array  # (K, 2)
    valid: jax.Array   # (K,)


@functools.partial(jax.jit, static_argnames=("max_corners",))
def replenish_features(pool: FeaturePool, img: jax.Array,
                       max_corners: int = 2000) -> FeaturePool:
    """Fill invalid slots with fresh Shi-Tomasi corners."""
    fresh = shi_tomasi_corners(img, max_corners=max_corners)
    take_fresh = ~pool.valid & fresh.valid
    points = jnp.where(take_fresh[:, None], fresh.points, pool.points)
    return FeaturePool(points=points, valid=pool.valid | take_fresh)


@functools.partial(jax.jit, static_argnames=("max_corners", "smooth"))
def lk_dense_flow(img0: jax.Array, img1: jax.Array, max_corners: int = 2000,
                  smooth: int = 33) -> jax.Array:
    """Dense flow from sparse LK tracks (the --flow-source LUCAS_KANADE path).

    Tracked displacements scatter-add into a grid with validity weights and
    densify by normalized convolution (Knutsson & Westin) with a Gaussian
    applicability — nearby tracks dominate, so interpolation is locally
    accurate instead of a flat window average. Where track density vanishes
    (textureless regions attract no Shi–Tomasi corners) the field blends
    into a validity-weighted global affine fit of all tracks rather than
    the zero flow the box-average version produced. The reference never
    densifies LK; this exists so the LK source plugs into the same pipeline
    surface, with an accuracy gate in tests/test_cross_domain.py.
    """
    h, w = img0.shape[:2]
    corners = shi_tomasi_corners(img0, max_corners=max_corners,
                                 quality_level=0.05)
    tracked = lucas_kanade_track(img0, img1, corners.points)
    disp = tracked.points - corners.points
    ok = (corners.valid & tracked.status).astype(jnp.float32)

    xi = jnp.clip(corners.points[:, 0], 0, w - 1).astype(jnp.int32)
    yi = jnp.clip(corners.points[:, 1], 0, h - 1).astype(jnp.int32)
    grid_flow = jnp.zeros((h, w, 2), jnp.float32).at[yi, xi].add(disp * ok[:, None])
    grid_wgt = jnp.zeros((h, w), jnp.float32).at[yi, xi].add(ok)

    # normalized convolution: Gaussian applicability (σ = smooth/4), run as
    # two banded MXU matmuls like every other separable pass
    sigma = smooth / 4.0
    half = smooth // 2
    g = np.exp(-0.5 * (np.arange(-half, half + 1) / sigma) ** 2)
    gk = tuple(float(v) for v in g)
    num = _sep_correlate(grid_flow, gk, gk, "edge", "highest")
    den = _sep_correlate(grid_wgt, gk, gk, "edge", "highest")
    local = num / jnp.maximum(den, 1e-6)[..., None]

    # validity-weighted affine fit over all tracks: disp ≈ [x', y', 1] @ coef
    # with coordinates centered and scaled to ~[-1, 1] — unnormalized normal
    # equations at 1920x1024 have condition ~1e7, past f32's useful range
    scale = float(max(h, w))
    pts = corners.points
    xn = (pts[:, 0] - w / 2.0) / scale
    yn = (pts[:, 1] - h / 2.0) / scale
    X = jnp.stack([xn, yn, jnp.ones_like(xn)], axis=1)
    Xw = X * ok[:, None]
    M = jnp.dot(X.T, Xw, precision=jax.lax.Precision.HIGHEST)
    M = M + 1e-4 * jnp.eye(3, dtype=jnp.float32)
    rhs = jnp.dot(Xw.T, disp, precision=jax.lax.Precision.HIGHEST)
    coef = jnp.linalg.solve(M, rhs)  # (3, 2)
    gy, gx = jnp.mgrid[0:h, 0:w]
    gxn = (gx[..., None] - w / 2.0) / scale
    gyn = (gy[..., None] - h / 2.0) / scale
    plane = gxn * coef[0] + gyn * coef[1] + coef[2]

    # blend by track density: conf -> 1 where tracks are dense, -> 0 where
    # the Gaussian window saw (almost) none
    conf = (den / (den + 0.05))[..., None]
    return conf * local + (1.0 - conf) * plane.astype(jnp.float32)
