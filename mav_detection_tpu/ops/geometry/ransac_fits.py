"""Batched RANSAC ego-motion model fitting on device.

TPU-native replacement for the reference's OpenCV calls
(``/root/reference/src/detector.py:138-151``): affine / homography /
fundamental / essential estimation from ~1000 sampled flow correspondences.

Design: hypothesis generation is a vmap over K minimal samples (each an exact
small solve), consensus scoring is one (K, N) residual matrix reduction, and
the winner is refit by weighted least squares over its inliers — all under
one jit, no data-dependent shapes.

cv2 parameter parity targets:
* ``estimateAffine2D`` — RANSAC, reprojection threshold 3.0 px (defaults).
* ``findHomography(coords_old, coords_new)`` — method 0 = plain least squares
  over ALL points (the reference's call has no RANSAC flag).
* ``findFundamentalMat(..., FM_RANSAC, 0.999, 1.0)`` — threshold 0.999 px.
* ``findEssentialMat(..., focal, (0,0), FM_RANSAC, 0.999, 1.0)``.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp


# ------------------------------------------------------------------ helpers
def _sample_minimal_sets(key: jax.Array, n_points: int, k_hyps: int,
                         set_size: int) -> jax.Array:
    """(k_hyps, set_size) random index sets (with replacement across sets)."""
    return jax.random.randint(key, (k_hyps, set_size), 0, n_points)


def _normalize_points(pts: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Hartley normalization: translate to centroid, scale mean dist to sqrt2."""
    mean = jnp.mean(pts, axis=0)
    centered = pts - mean
    scale = jnp.sqrt(2.0) / jnp.maximum(jnp.mean(jnp.linalg.norm(centered, axis=1)), 1e-8)
    T = jnp.array(
        [[scale, 0.0, -scale * mean[0]],
         [0.0, scale, -scale * mean[1]],
         [0.0, 0.0, 1.0]], pts.dtype)
    return centered * scale, T


# ------------------------------------------------------------------- affine
def _affine_from_3pts(p0: jax.Array, p1: jax.Array) -> jax.Array:
    """Exact 2x3 affine mapping three points p0 -> p1."""
    A = jnp.concatenate([p0, jnp.ones((3, 1), p0.dtype)], axis=1)  # (3, 3)
    # solve A @ M^T = p1  ->  M^T = A^-1 p1  (columns: [a b; c d; tx ty])
    sol = jnp.linalg.solve(A, p1)  # (3, 2)
    return sol.T  # (2, 3) rows [a, b, tx; c, d, ty]


def _affine_residuals(M: jax.Array, p0: jax.Array, p1: jax.Array) -> jax.Array:
    pred = p0 @ M[:, :2].T + M[:, 2]
    return jnp.linalg.norm(pred - p1, axis=-1)


def _affine_lstsq(p0: jax.Array, p1: jax.Array, w: jax.Array) -> jax.Array:
    """Weighted least-squares affine via normal equations (static shape)."""
    A = jnp.concatenate([p0, jnp.ones((p0.shape[0], 1), p0.dtype)], axis=1)
    Aw = A * w[:, None]
    AtA = A.T @ Aw + 1e-8 * jnp.eye(3, dtype=p0.dtype)
    sol = jnp.linalg.solve(AtA, Aw.T @ p1)
    return sol.T


@functools.partial(jax.jit, static_argnames=("iters",))
def fit_affine_ransac(p0: jax.Array, p1: jax.Array, key: jax.Array,
                      iters: int = 256, threshold: float = 3.0
                      ) -> Tuple[jax.Array, jax.Array]:
    """RANSAC 2x3 affine fit; returns (M, inlier_mask)."""
    n = p0.shape[0]
    idx = _sample_minimal_sets(key, n, iters, 3)
    hyps = jax.vmap(lambda i: _affine_from_3pts(p0[i], p1[i]))(idx)  # (K,2,3)
    res = jax.vmap(lambda M: _affine_residuals(M, p0, p1))(hyps)     # (K,N)
    ok = jnp.isfinite(res)
    res = jnp.where(ok, res, jnp.inf)
    scores = jnp.sum(res < threshold, axis=1)
    best = jnp.argmax(scores)
    inliers = res[best] < threshold
    M = _affine_lstsq(p0, p1, inliers.astype(p0.dtype))
    return M, inliers


# --------------------------------------------------------------- homography
def _homography_dlt(p0: jax.Array, p1: jax.Array, w: jax.Array) -> jax.Array:
    """Weighted DLT: smallest right singular vector of the (2N, 9) system."""
    x, y = p0[:, 0], p0[:, 1]
    u, v = p1[:, 0], p1[:, 1]
    zero = jnp.zeros_like(x)
    one = jnp.ones_like(x)
    r1 = jnp.stack([x, y, one, zero, zero, zero, -u * x, -u * y, -u], axis=1)
    r2 = jnp.stack([zero, zero, zero, x, y, one, -v * x, -v * y, -v], axis=1)
    A = jnp.concatenate([r1 * w[:, None], r2 * w[:, None]], axis=0)
    _, _, vt = jnp.linalg.svd(A, full_matrices=False)
    return vt[-1].reshape(3, 3)


def _homography_residuals(H: jax.Array, p0: jax.Array, p1: jax.Array) -> jax.Array:
    ph = jnp.concatenate([p0, jnp.ones((p0.shape[0], 1), p0.dtype)], axis=1)
    proj = ph @ H.T
    zsafe = jnp.where(jnp.abs(proj[:, 2]) > 1e-12, proj[:, 2], 1e-12)
    pred = proj[:, :2] / zsafe[:, None]
    return jnp.linalg.norm(pred - p1, axis=-1)


@jax.jit
def fit_homography_lstsq(p0: jax.Array, p1: jax.Array) -> jax.Array:
    """Plain least-squares homography over all points — the semantics of the
    reference's ``cv2.findHomography`` call (no method flag -> method 0).
    Normalized DLT, rescaled so H[2,2] = 1."""
    p0n, T0 = _normalize_points(p0)
    p1n, T1 = _normalize_points(p1)
    Hn = _homography_dlt(p0n, p1n, jnp.ones(p0.shape[0], p0.dtype))
    H = jnp.linalg.inv(T1) @ Hn @ T0
    return H / jnp.where(jnp.abs(H[2, 2]) > 1e-12, H[2, 2], 1e-12)


@functools.partial(jax.jit, static_argnames=("iters",))
def fit_homography_ransac(p0: jax.Array, p1: jax.Array, key: jax.Array,
                          iters: int = 256, threshold: float = 3.0
                          ) -> Tuple[jax.Array, jax.Array]:
    """RANSAC homography (4-point DLT hypotheses + DLT refit on inliers)."""
    n = p0.shape[0]
    idx = _sample_minimal_sets(key, n, iters, 4)

    def hyp(i):
        w4 = jnp.ones(4, p0.dtype)
        return _homography_dlt(p0[i], p1[i], w4)

    hyps = jax.vmap(hyp)(idx)
    res = jax.vmap(lambda H: _homography_residuals(H, p0, p1))(hyps)
    res = jnp.where(jnp.isfinite(res), res, jnp.inf)
    scores = jnp.sum(res < threshold, axis=1)
    best = jnp.argmax(scores)
    inliers = res[best] < threshold
    p0n, T0 = _normalize_points(p0)
    p1n, T1 = _normalize_points(p1)
    Hn = _homography_dlt(p0n, p1n, inliers.astype(p0.dtype))
    H = jnp.linalg.inv(T1) @ Hn @ T0
    H = H / jnp.where(jnp.abs(H[2, 2]) > 1e-12, H[2, 2], 1e-12)
    return H, inliers


# -------------------------------------------- fundamental / essential (8pt)
def _eightpoint(p0: jax.Array, p1: jax.Array, w: jax.Array,
                essential: bool) -> jax.Array:
    """Normalized 8-point algorithm; optionally project onto the essential
    manifold (singular values (s, s, 0) with s = mean of the top two)."""
    p0n, T0 = _normalize_points(p0)
    p1n, T1 = _normalize_points(p1)
    x, y = p0n[:, 0], p0n[:, 1]
    u, v = p1n[:, 0], p1n[:, 1]
    one = jnp.ones_like(x)
    A = jnp.stack([u * x, u * y, u, v * x, v * y, v, x, y, one], axis=1)
    A = A * w[:, None]
    _, _, vt = jnp.linalg.svd(A, full_matrices=False)
    F = vt[-1].reshape(3, 3)
    U, S, Vt = jnp.linalg.svd(F)
    if essential:
        s = (S[0] + S[1]) / 2.0
        S = jnp.array([1.0, 1.0, 0.0], F.dtype) * s
    else:
        S = S.at[2].set(0.0)
    F = U @ jnp.diag(S) @ Vt
    F = T1.T @ F @ T0
    norm = jnp.linalg.norm(F)
    return F / jnp.where(norm > 1e-12, norm, 1.0)


def _sampson_dist(F: jax.Array, p0: jax.Array, p1: jax.Array) -> jax.Array:
    """Sampson distance (first-order geometric error) of x1^T F x0 = 0."""
    ph0 = jnp.concatenate([p0, jnp.ones((p0.shape[0], 1), p0.dtype)], axis=1)
    ph1 = jnp.concatenate([p1, jnp.ones((p1.shape[0], 1), p1.dtype)], axis=1)
    Fx0 = ph0 @ F.T       # (N, 3) = F x0
    Ftx1 = ph1 @ F        # (N, 3) = F^T x1
    num = jnp.sum(ph1 * Fx0, axis=1) ** 2
    den = Fx0[:, 0] ** 2 + Fx0[:, 1] ** 2 + Ftx1[:, 0] ** 2 + Ftx1[:, 1] ** 2
    return jnp.sqrt(num / jnp.maximum(den, 1e-12))


def _fit_epipolar_ransac(p0, p1, key, iters, threshold, essential):
    n = p0.shape[0]
    idx = _sample_minimal_sets(key, n, iters, 8)

    def hyp(i):
        return _eightpoint(p0[i], p1[i], jnp.ones(8, p0.dtype), essential)

    hyps = jax.vmap(hyp)(idx)
    res = jax.vmap(lambda F: _sampson_dist(F, p0, p1))(hyps)
    res = jnp.where(jnp.isfinite(res), res, jnp.inf)
    scores = jnp.sum(res < threshold, axis=1)
    best = jnp.argmax(scores)
    inliers = res[best] < threshold
    # Iterated refit: float32 8-point at pixel scale leaves ~0.3 px Sampson
    # noise; two reweighted refits over the consensus set recover the
    # precision a float64 solver would give.
    F = _eightpoint(p0, p1, inliers.astype(p0.dtype), essential)
    for _ in range(2):
        d = _sampson_dist(F, p0, p1)
        inliers = d < threshold
        F = _eightpoint(p0, p1, inliers.astype(p0.dtype), essential)
    return F, inliers


@functools.partial(jax.jit, static_argnames=("iters",))
def fit_fundamental_ransac(p0: jax.Array, p1: jax.Array, key: jax.Array,
                           iters: int = 256, threshold: float = 0.999
                           ) -> Tuple[jax.Array, jax.Array]:
    return _fit_epipolar_ransac(p0, p1, key, iters, threshold, essential=False)


@functools.partial(jax.jit, static_argnames=("iters",))
def fit_essential_ransac(p0: jax.Array, p1: jax.Array, key: jax.Array,
                         focal: float = 1.0, iters: int = 256,
                         threshold: float = 1.0
                         ) -> Tuple[jax.Array, jax.Array]:
    """Essential matrix from pixel coords with focal normalization
    (principal point (0, 0) like the reference, ``detector.py:146-150``)."""
    q0 = p0 / focal
    q1 = p1 / focal
    return _fit_epipolar_ransac(q0, q1, key, iters, threshold / focal,
                                essential=True)


# -------------------------------------------------------------- decompose
@jax.jit
def decompose_essential(E: jax.Array) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """E -> (R1, R2, t) with det(R) = +1 (cv2.decomposeEssentialMat parity)."""
    U, _, Vt = jnp.linalg.svd(E)
    U = U * jnp.sign(jnp.linalg.det(U))
    Vt = Vt * jnp.sign(jnp.linalg.det(Vt))
    W = jnp.array([[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]], E.dtype)
    R1 = U @ W @ Vt
    R2 = U @ W.T @ Vt
    t = U[:, 2:3]
    return R1, R2, t


@jax.jit
def rotation_matrix_to_euler(R: jax.Array) -> jax.Array:
    """Rotation matrix -> XYZ euler angles in degrees (reference convention,
    ``/root/reference/src/utils.py:305-347``)."""
    sy = jnp.sqrt(R[0, 0] ** 2 + R[1, 0] ** 2)
    singular = sy < 1e-6
    x = jnp.where(singular, jnp.arctan2(-R[1, 2], R[1, 1]), jnp.arctan2(R[2, 1], R[2, 2]))
    y = jnp.arctan2(-R[2, 0], sy)
    z = jnp.where(singular, 0.0, jnp.arctan2(R[1, 0], R[0, 0]))
    return jnp.rad2deg(jnp.stack([x, y, z]))
