"""Model-fit parity tests vs OpenCV oracles (distributional, seeds pinned)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mav_detection_tpu.ops.geometry import (
    fit_affine_ransac,
    fit_homography_lstsq,
    fit_homography_ransac,
    fit_fundamental_ransac,
    fit_essential_ransac,
    decompose_essential,
    rotation_matrix_to_euler,
    kmeans,
    cluster_image,
    remap_bilinear,
    warp_affine,
    warp_perspective,
    affine_motion_field,
    homography_motion_field,
    subtract_global_motion,
)

cv2 = pytest.importorskip("cv2")


def correspondences(rng, n=300, noise=0.3, outlier_frac=0.2,
                    M=np.array([[1.02, 0.03, 5.0], [-0.02, 0.99, -3.0]])):
    p0 = rng.uniform(20, 700, (n, 2)).astype(np.float64)
    p1 = p0 @ M[:, :2].T + M[:, 2] + rng.normal(scale=noise, size=(n, 2))
    n_out = int(n * outlier_frac)
    p1[:n_out] += rng.uniform(-80, 80, (n_out, 2))
    return p0.astype(np.float32), p1.astype(np.float32), M


class TestAffine:
    def test_recovers_affine_with_outliers(self):
        rng = np.random.default_rng(101)
        p0, p1, M_true = correspondences(rng)
        M, inl = fit_affine_ransac(jnp.asarray(p0), jnp.asarray(p1), jax.random.PRNGKey(0))
        M_cv, _ = cv2.estimateAffine2D(p0, p1)
        np.testing.assert_allclose(np.asarray(M), M_true, atol=0.12)
        np.testing.assert_allclose(np.asarray(M), M_cv, atol=0.12)
        assert int(jnp.sum(inl)) > 200  # the 80% inliers found

    def test_exact_on_clean_data(self):
        rng = np.random.default_rng(102)
        p0, p1, M_true = correspondences(rng, noise=0.0, outlier_frac=0.0)
        M, inl = fit_affine_ransac(jnp.asarray(p0), jnp.asarray(p1), jax.random.PRNGKey(1))
        np.testing.assert_allclose(np.asarray(M), M_true, atol=5e-3)


class TestHomography:
    def _h_pair(self, rng, noise=0.0):
        H_true = np.array([[1.01, 0.02, 8.0], [0.01, 0.98, -5.0], [1e-5, -2e-5, 1.0]])
        p0 = rng.uniform(20, 700, (200, 2))
        ph = np.concatenate([p0, np.ones((200, 1))], 1) @ H_true.T
        p1 = ph[:, :2] / ph[:, 2:3] + rng.normal(scale=noise, size=(200, 2))
        return p0.astype(np.float32), p1.astype(np.float32), H_true

    def test_lstsq_matches_cv2_method0(self):
        rng = np.random.default_rng(103)
        p0, p1, H_true = self._h_pair(rng, noise=0.2)
        H = np.asarray(fit_homography_lstsq(jnp.asarray(p0), jnp.asarray(p1)))
        H_cv, _ = cv2.findHomography(p0, p1)  # method 0 = least squares
        np.testing.assert_allclose(H, H_cv, rtol=0.05, atol=1e-3)

    def test_ransac_with_outliers(self):
        rng = np.random.default_rng(77)
        p0, p1, H_true = self._h_pair(rng, noise=0.3)
        n_out = 40
        p1 = p1.copy()
        p1[:n_out] += rng.uniform(-100, 100, (n_out, 2)).astype(np.float32)
        H, inl = fit_homography_ransac(jnp.asarray(p0), jnp.asarray(p1), jax.random.PRNGKey(2))
        np.testing.assert_allclose(np.asarray(H), H_true, rtol=0.05, atol=5e-3)
        assert int(jnp.sum(inl)) > 120


class TestEpipolar:
    def _epi_pair(self, rng, n=300):
        # synthetic two-view geometry: known R, t
        angles = np.deg2rad([2.0, -3.0, 1.0])
        Rx = cv2.Rodrigues(np.array([angles[0], 0, 0]))[0]
        Ry = cv2.Rodrigues(np.array([0, angles[1], 0]))[0]
        Rz = cv2.Rodrigues(np.array([0, 0, angles[2]]))[0]
        R = Rz @ Ry @ Rx
        t = np.array([0.2, -0.1, 1.0])
        t = t / np.linalg.norm(t)
        X = rng.uniform(-2, 2, (n, 3)) + np.array([0, 0, 6.0])
        x0 = X[:, :2] / X[:, 2:3]
        Xc = X @ R.T + t
        x1 = Xc[:, :2] / Xc[:, 2:3]
        return x0.astype(np.float32), x1.astype(np.float32), R, t

    def test_essential_epipolar_constraint(self):
        rng = np.random.default_rng(104)
        x0, x1, R, t = self._epi_pair(rng)
        E, inl = fit_essential_ransac(jnp.asarray(x0), jnp.asarray(x1),
                                      jax.random.PRNGKey(3), focal=1.0)
        E = np.asarray(E)
        # true E = [t]x R (up to scale)
        tx = np.array([[0, -t[2], t[1]], [t[2], 0, -t[0]], [-t[1], t[0], 0]])
        E_true = tx @ R
        E_true /= np.linalg.norm(E_true)
        # align sign and compare
        if np.sum(E * E_true) < 0:
            E = -E
        np.testing.assert_allclose(E, E_true, atol=1e-2)
        assert int(jnp.sum(inl)) > 280

    def test_decompose_essential_recovers_rotation(self):
        rng = np.random.default_rng(105)
        x0, x1, R, t = self._epi_pair(rng)
        E, _ = fit_essential_ransac(jnp.asarray(x0), jnp.asarray(x1),
                                    jax.random.PRNGKey(4), focal=1.0)
        R1, R2, tt = decompose_essential(E)
        # one of the two rotations must match R (within noise)
        e1 = np.abs(np.asarray(rotation_matrix_to_euler(R1)) -
                    np.asarray(rotation_matrix_to_euler(jnp.asarray(R))))
        e2 = np.abs(np.asarray(rotation_matrix_to_euler(R2)) -
                    np.asarray(rotation_matrix_to_euler(jnp.asarray(R))))
        assert min(e1.max(), e2.max()) < 0.5  # degrees

    def test_fundamental_inlier_detection(self):
        rng = np.random.default_rng(106)
        x0, x1, _, _ = self._epi_pair(rng)
        # pixels: scale up
        p0 = x0 * 400 + 400
        p1 = x1 * 400 + 400
        p1 = p1.copy()
        p1[:50] += rng.uniform(-60, 60, (50, 2)).astype(np.float32)
        F, inl = fit_fundamental_ransac(jnp.asarray(p0), jnp.asarray(p1),
                                        jax.random.PRNGKey(5))
        inl = np.asarray(inl)
        assert inl[50:].mean() > 0.9   # true inliers kept
        assert inl[:50].mean() < 0.2   # outliers rejected


class TestRotationEuler:
    def test_matches_reference_formula(self):
        rng = np.random.default_rng(107)
        for _ in range(5):
            rvec = rng.normal(scale=0.5, size=3)
            R = cv2.Rodrigues(rvec)[0]
            ours = np.asarray(rotation_matrix_to_euler(jnp.asarray(R)))
            # reference formula (utils.py:305-347)
            sy = np.sqrt(R[0, 0] ** 2 + R[1, 0] ** 2)
            if sy >= 1e-6:
                ref = np.rad2deg([np.arctan2(R[2, 1], R[2, 2]),
                                  np.arctan2(-R[2, 0], sy),
                                  np.arctan2(R[1, 0], R[0, 0])])
            else:
                ref = np.rad2deg([np.arctan2(-R[1, 2], R[1, 1]),
                                  np.arctan2(-R[2, 0], sy), 0.0])
            np.testing.assert_allclose(ours, ref, atol=1e-3)


class TestKmeans:
    def test_separates_clusters(self):
        rng = np.random.default_rng(108)
        a = rng.normal(loc=0.0, scale=0.5, size=(100, 2))
        b = rng.normal(loc=10.0, scale=0.5, size=(100, 2))
        pts = jnp.asarray(np.concatenate([a, b]).astype(np.float32))
        comp, labels, centers = kmeans(pts, jax.random.PRNGKey(0), k=2)
        labels = np.asarray(labels)
        assert len(set(labels[:100])) == 1
        assert len(set(labels[100:])) == 1
        assert labels[0] != labels[150]

    def test_cluster_image_shapes(self):
        rng = np.random.default_rng(109)
        img = jnp.asarray((rng.random((32, 32)) * 255).astype(np.float32))
        quant, mask = cluster_image(img, jax.random.PRNGKey(1), k=4)
        assert quant.shape == (32, 32)
        assert mask.dtype == jnp.bool_


class TestWarps:
    def test_warp_affine_matches_cv2(self):
        rng = np.random.default_rng(110)
        img = (rng.random((64, 80)) * 255).astype(np.float32)
        M = np.float32([[1.05, 0.02, 3.0], [-0.01, 0.97, -2.0]])
        ours = np.asarray(warp_affine(jnp.asarray(img), jnp.asarray(M)))
        ref = cv2.warpAffine(img, M, (80, 64))
        inner = (slice(4, -4), slice(4, -4))
        assert np.abs(ours - ref)[inner].max() < 0.5

    def test_warp_perspective_matches_cv2(self):
        rng = np.random.default_rng(111)
        img = (rng.random((64, 80)) * 255).astype(np.float32)
        H = np.float32([[1.02, 0.01, 2.0], [0.0, 0.99, 1.0], [1e-4, -1e-4, 1.0]])
        ours = np.asarray(warp_perspective(jnp.asarray(img), jnp.asarray(H)))
        ref = cv2.warpPerspective(img, H, (80, 64))
        inner = (slice(4, -4), slice(4, -4))
        assert np.abs(ours - ref)[inner].max() < 0.5

    def test_remap_matches_cv2(self):
        rng = np.random.default_rng(112)
        img = (rng.random((48, 64)) * 255).astype(np.float32)
        mx = (rng.random((48, 64)) * 63).astype(np.float32)
        my = (rng.random((48, 64)) * 47).astype(np.float32)
        ours = np.asarray(remap_bilinear(jnp.asarray(img), jnp.asarray(mx), jnp.asarray(my)))
        ref = cv2.remap(img, mx, my, cv2.INTER_LINEAR)
        assert np.abs(ours - ref).max() < 0.5


class TestGlobalMotion:
    def test_affine_field_matches_reference_math(self):
        rng = np.random.default_rng(113)
        M = np.array([[1.01, 0.02, 3.0], [-0.02, 0.99, -1.0]], np.float32)
        h, w = 24, 32
        field = np.asarray(affine_motion_field(jnp.asarray(M), h, w))
        xs = np.tile(np.arange(w), (h, 1)).astype(np.float64)
        ys = np.tile(np.arange(h), (w, 1)).T.astype(np.float64)
        ref_u = M[0, 0] * xs + M[0, 1] * ys + M[0, 2] - xs
        ref_v = M[1, 0] * xs + M[1, 1] * ys + M[1, 2] - ys
        np.testing.assert_allclose(field[..., 0], ref_u, atol=1e-3)
        np.testing.assert_allclose(field[..., 1], ref_v, atol=1e-3)

    def test_subtract_orientation_matches_reference(self):
        rng = np.random.default_rng(114)
        flow = rng.normal(size=(16, 16, 2)).astype(np.float32)
        gm = rng.normal(size=(16, 16, 2)).astype(np.float32)
        res, mag = subtract_global_motion(jnp.asarray(flow), jnp.asarray(gm))
        np.testing.assert_allclose(np.asarray(res), gm - flow, atol=1e-6)
        np.testing.assert_allclose(np.asarray(mag), np.linalg.norm(gm - flow, axis=-1), rtol=1e-5)

    def test_homography_field_nonprojective_matches_reference(self):
        H = np.array([[1.0, 0.0, 2.0], [0.0, 1.0, -3.0], [1e-4, 0.0, 1.0]], np.float32)
        field = np.asarray(homography_motion_field(jnp.asarray(H), 8, 8))
        # reference's manual 2-row multiply ignores the projective row
        assert np.allclose(field[..., 0], 2.0, atol=1e-5)
        assert np.allclose(field[..., 1], -3.0, atol=1e-5)
