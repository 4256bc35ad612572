"""Geometry-op parity tests: FoE voting, derotation, phi, thresholds.

Oracles re-implement the reference's numpy math verbatim (with injected
deterministic samples so both sides see identical randomness).
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mav_detection_tpu.ops.geometry import (
    line_intersections,
    foe_ransac,
    get_foe_dense,
    get_phi,
    derotation_field,
    derotate,
    detection_masks,
)


# ---------------------------------------------------------------- oracles
def ref_line_intersection(line1, line2):
    # verbatim /root/reference/src/utils.py:183-197
    xdiff = (line1[0][0] - line1[1][0], line2[0][0] - line2[1][0])
    ydiff = (line1[0][1] - line1[1][1], line2[0][1] - line2[1][1])

    def det(a, b):
        return a[0] * b[1] - a[1] * b[0]

    div = det(xdiff, ydiff)
    if div == 0:
        return False, False
    d = (det(*line1), det(*line2))
    x = det(d, xdiff) / div
    y = det(d, ydiff) / div
    return x, y


def ref_ransac(estimates, threshold=30.0):
    # verbatim /root/reference/src/focus_of_expansion.py:32-54
    optimum = 0
    optimal_foe = (0.0, 0.0)
    for i in range(estimates.shape[0]):
        chosen = estimates[i]
        count = np.linalg.norm(estimates - chosen, axis=-1)
        inliers = count[count < threshold]
        score = inliers.shape[0] - 1
        if score > optimum:
            optimum = score
            optimal_foe = tuple(chosen)
    return optimal_foe


def ref_get_foe_dense(flow_uv, rand1, N=1000, mag_thresh=2.5, ransac_thresh=30.0):
    # verbatim /root/reference/src/focus_of_expansion.py:56-86 with rand1 injected
    intersections = np.zeros((N, 2))
    for i in range(N):
        coord1, coord2 = rand1[i, :], rand1[i + N, :]
        flow1 = flow_uv[coord1[0], coord1[1], :]
        flow2 = flow_uv[coord2[0], coord2[1], :]
        if np.linalg.norm(flow2) < mag_thresh:
            continue
        c1 = coord1[::-1]
        c2 = coord2[::-1]
        intersections[i, :] = ref_line_intersection(
            (c1, flow1 + c1), (c2, flow2 + c2)
        )
    intersections = intersections[intersections[:, 0] != 0.0, :]
    return ref_ransac(intersections, ransac_thresh)


def ref_get_phi(flow, foe):
    # verbatim /root/reference/src/focus_of_expansion.py:150-184
    h, w = flow.shape[:2]
    x_coords = np.tile(np.arange(w), (h, 1))
    y_coords = np.tile(np.arange(h), (w, 1)).T
    diff1 = flow
    diff2 = np.zeros_like(flow)
    diff2[..., 0] = x_coords - foe[0]
    diff2[..., 1] = y_coords - foe[1]
    fm = np.linalg.norm(diff1, axis=-1)
    dist = np.linalg.norm(diff2, axis=-1)
    norm = np.maximum(np.ones_like(fm) * 1e-6, fm * dist)
    arg = (diff1[..., 0] * diff2[..., 0] + diff1[..., 1] * diff2[..., 1]) / norm
    arg = np.clip(arg, -1, 1)
    ang = np.arccos(arg)
    ang[np.isnan(ang)] = 0
    return np.rad2deg(ang)


def ref_derotation(flow_uv, omega, dt):
    # verbatim /root/reference/src/detector.py:84-117
    h, w = flow_uv.shape[:2]
    x_coords = np.tile(np.arange(w), (h, 1))
    y_coords = np.tile(np.arange(h), (w, 1)).T
    xc = -(x_coords / w - 0.5) * 2.0
    yc = -(y_coords / h - 0.5) * 2.0
    omega = omega / dt
    der = np.array([
        +omega[0] * xc * yc - omega[1] * xc ** 2 - omega[1] + omega[2] * yc,
        -omega[2] * xc + omega[0] + omega[0] * yc ** 2 - omega[1] * xc * yc,
    ]).swapaxes(0, 1).swapaxes(1, 2)
    der[..., 0] *= w * dt / 2
    der[..., 1] *= h * dt / 2
    return flow_uv - der


def radial_flow(h, w, foe, scale=0.1, dtype=np.float32):
    ys, xs = np.mgrid[0:h, 0:w]
    return np.stack([(xs - foe[0]) * scale, (ys - foe[1]) * scale], -1).astype(dtype)


# ------------------------------------------------------------------ tests
class TestLineIntersection:
    def test_batch_matches_reference(self, rng):
        n = 64
        p1 = rng.uniform(0, 100, (n, 2))
        d1 = rng.normal(size=(n, 2))
        p2 = rng.uniform(0, 100, (n, 2))
        d2 = rng.normal(size=(n, 2))
        pts, valid = line_intersections(
            jnp.asarray(p1), jnp.asarray(d1), jnp.asarray(p2), jnp.asarray(d2)
        )
        pts, valid = np.asarray(pts), np.asarray(valid)
        for i in range(n):
            ref = ref_line_intersection(
                (p1[i], p1[i] + d1[i]), (p2[i], p2[i] + d2[i])
            )
            if ref[0] is False:
                assert not valid[i]
            else:
                assert valid[i]
                # float32 kernel vs float64 oracle: intersections of nearly
                # parallel lines amplify rounding, so gate on relative error.
                np.testing.assert_allclose(pts[i], ref, rtol=5e-4, atol=1e-3)

    def test_parallel_lines_invalid(self):
        p1 = jnp.array([[0.0, 0.0]])
        d = jnp.array([[1.0, 1.0]])
        p2 = jnp.array([[5.0, 0.0]])
        pts, valid = line_intersections(p1, d, p2, d)
        assert not bool(valid[0])
        np.testing.assert_array_equal(np.asarray(pts[0]), [0.0, 0.0])


class TestFoeRansac:
    def test_matches_reference_vote(self, rng):
        # cluster around (100, 80) + outliers
        cluster = rng.normal(loc=(100, 80), scale=5.0, size=(50, 2))
        outliers = rng.uniform(0, 500, (30, 2))
        estimates = np.concatenate([cluster, outliers]).astype(np.float32)
        ref = ref_ransac(estimates)
        ours = np.asarray(
            foe_ransac(jnp.asarray(estimates), jnp.ones(len(estimates), bool))
        )
        np.testing.assert_allclose(ours, ref, rtol=1e-5)

    def test_no_consensus_returns_zero(self):
        # all points isolated -> every score is 0, never > optimum=0
        estimates = jnp.asarray(np.arange(20).reshape(10, 2) * 100.0)
        ours = np.asarray(foe_ransac(estimates, jnp.ones(10, bool)))
        np.testing.assert_array_equal(ours, [0.0, 0.0])


class TestGetFoeDense:
    def test_full_parity_with_injected_samples(self, rng):
        h, w = 120, 160
        true_foe = (70.0, 50.0)
        flow = radial_flow(h, w, true_foe, scale=0.12)
        flow += rng.normal(scale=0.02, size=flow.shape).astype(np.float32)
        N = 300
        rand1 = np.zeros((2 * N, 2), dtype=np.int64)
        rand1[:, 0] = rng.integers(0, h, 2 * N)
        rand1[:, 1] = rng.integers(0, w, 2 * N)

        ref = ref_get_foe_dense(flow, rand1, N=N)
        ours = np.asarray(
            get_foe_dense(
                jnp.asarray(flow),
                jax.random.PRNGKey(0),
                num_samples=N,
                sample_yx=jnp.asarray(rand1),
            )
        )
        np.testing.assert_allclose(ours, np.array(ref), rtol=1e-4, atol=1e-3)

    def test_recovers_true_foe_with_random_sampling(self, rng):
        h, w = 96, 128
        true_foe = (90.0, 40.0)
        flow = radial_flow(h, w, true_foe, scale=0.2)
        ours = np.asarray(
            get_foe_dense(jnp.asarray(flow), jax.random.PRNGKey(42), num_samples=256)
        )
        # pure radial field: every intersection is exactly the FoE
        np.testing.assert_allclose(ours, true_foe, atol=1.0)

    def test_low_magnitude_flow_gives_zero(self):
        flow = jnp.full((64, 64, 2), 0.1, jnp.float32)  # below 2.5 px gate
        ours = np.asarray(get_foe_dense(flow, jax.random.PRNGKey(1), num_samples=128))
        np.testing.assert_array_equal(ours, [0.0, 0.0])


class TestGetPhi:
    def test_parity(self, rng):
        flow = rng.normal(size=(48, 64, 2)).astype(np.float32) * 3
        foe = (30.0, 20.0)
        ours = np.asarray(get_phi(jnp.asarray(flow), jnp.asarray(foe)))
        ref = ref_get_phi(flow, foe)
        # float32 arccos near ±1 amplifies rounding; 0.05° is far below the
        # coarsest threshold the pipeline applies (0.25°).
        np.testing.assert_allclose(ours, ref, atol=5e-2)

    def test_pure_radial_flow_phi_zero(self):
        foe = (64.0, 32.0)
        flow = radial_flow(64, 128, foe)
        phi = np.asarray(get_phi(jnp.asarray(flow), jnp.asarray(foe)))
        # everywhere the flow points exactly away from the FoE
        assert np.percentile(phi, 99) < 0.5

    def test_reversed_flow_phi_180(self):
        foe = (64.0, 32.0)
        flow = -radial_flow(64, 128, foe)
        phi = np.asarray(get_phi(jnp.asarray(flow), jnp.asarray(foe)))
        assert np.percentile(phi, 1) > 179.0


class TestDerotation:
    def test_parity(self, rng):
        flow = rng.normal(size=(48, 64, 2)).astype(np.float64)
        omega = np.array([0.02, -0.01, 0.005])
        dt = 0.1
        ours = np.asarray(derotate(jnp.asarray(flow), jnp.asarray(omega / dt), jnp.asarray(dt)))
        ref = ref_derotation(flow, omega, dt)
        np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)

    def test_zero_rates_identity(self, rng):
        flow = rng.normal(size=(32, 32, 2)).astype(np.float32)
        out = np.asarray(derotate(jnp.asarray(flow), jnp.zeros(3), jnp.asarray(0.05)))
        np.testing.assert_allclose(out, flow, atol=1e-6)


class TestDetectionMasks:
    def test_parity_with_reference_thresholds(self, rng):
        h, w = 32, 48
        phi = rng.uniform(0, 180, (h, w)).astype(np.float32)
        mag = rng.uniform(0.01, 10, (h, w)).astype(np.float32)
        sky = rng.random((h, w)) > 0.7

        total, fixed = detection_masks(jnp.asarray(phi), jnp.asarray(mag), jnp.asarray(sky))

        # verbatim processor.py:331-341
        above = phi > (0.25 + (0.5 + 8 / mag))
        below = phi < (0.25 - (0.5 + 8 / mag))
        angle_threshold = np.logical_or(above, below)
        ref_total = (mag > 0.5) * ~sky * angle_threshold
        ref_fixed = phi * (mag > 1.0) * ~sky > 15

        np.testing.assert_array_equal(np.asarray(total), ref_total)
        np.testing.assert_array_equal(np.asarray(fixed), ref_fixed)
