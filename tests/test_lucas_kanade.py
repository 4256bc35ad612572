"""Shi-Tomasi + pyramidal LK parity vs OpenCV."""
import numpy as np
import pytest

import jax.numpy as jnp

from mav_detection_tpu.ops.flow.lucas_kanade import (
    shi_tomasi_corners,
    lucas_kanade_track,
    FeaturePool,
    replenish_features,
)

cv2 = pytest.importorskip("cv2")


def textured(shape=(120, 160), blur=1.0, seed=0):
    rng = np.random.default_rng(seed)
    img = cv2.GaussianBlur(rng.random(shape).astype(np.float32), (0, 0), blur) * 255
    return img.astype(np.uint8)


class TestShiTomasi:
    def test_finds_synthetic_corners(self):
        img = np.zeros((100, 100), np.uint8)
        img[30:70, 30:70] = 255  # a square: 4 strong corners
        c = shi_tomasi_corners(jnp.asarray(img), max_corners=16, quality_level=0.2,
                               min_distance=7)
        pts = np.asarray(c.points)[np.asarray(c.valid)]
        expected = np.array([[30, 30], [69, 30], [30, 69], [69, 69]])
        for e in expected:
            assert np.min(np.linalg.norm(pts - e, axis=1)) < 3.0

    def test_overlap_with_cv2(self):
        img = textured(seed=1)
        ours = shi_tomasi_corners(jnp.asarray(img), max_corners=200,
                                  quality_level=0.2, min_distance=7)
        pts = np.asarray(ours.points)[np.asarray(ours.valid)]
        ref = cv2.goodFeaturesToTrack(img, maxCorners=200, qualityLevel=0.2,
                                      minDistance=7, blockSize=7)
        ref = ref[:, 0, :]
        # each cv2 corner should have one of ours nearby (same response field)
        dists = np.linalg.norm(ref[:, None, :] - pts[None, :, :], axis=-1)
        frac_matched = (dists.min(axis=1) < 4.0).mean()
        assert frac_matched > 0.8

    def test_min_distance_respected(self):
        img = textured(seed=2)
        c = shi_tomasi_corners(jnp.asarray(img), max_corners=100,
                               quality_level=0.1, min_distance=9)
        pts = np.asarray(c.points)[np.asarray(c.valid)]
        if len(pts) > 1:
            d = np.linalg.norm(pts[:, None] - pts[None, :], axis=-1)
            np.fill_diagonal(d, np.inf)
            assert d.min() >= 5.0  # NMS radius keeps peaks apart


class TestLucasKanade:
    def test_tracks_translation(self):
        img0 = textured(seed=3)
        M = np.float32([[1, 0, 3.0], [0, 1, -2.0]])
        img1 = cv2.warpAffine(img0, M, img0.shape[::-1])
        c = shi_tomasi_corners(jnp.asarray(img0), max_corners=100, quality_level=0.1)
        pts = np.asarray(c.points)[np.asarray(c.valid)][:50]
        # keep away from borders
        keep = ((pts[:, 0] > 25) & (pts[:, 0] < 135) & (pts[:, 1] > 25) & (pts[:, 1] < 95))
        pts = pts[keep]
        res = lucas_kanade_track(jnp.asarray(img0), jnp.asarray(img1),
                                 jnp.asarray(pts.astype(np.float32)))
        tracked = np.asarray(res.points)[np.asarray(res.status)]
        orig = pts[np.asarray(res.status)]
        flow = tracked - orig
        med = np.median(flow, axis=0)
        np.testing.assert_allclose(med, [3.0, -2.0], atol=0.15)

    def test_parity_with_cv2(self):
        img0 = textured(seed=4)
        M = np.float32([[1, 0, 2.0], [0, 1, 1.5]])
        img1 = cv2.warpAffine(img0, M, img0.shape[::-1])
        ref0 = cv2.goodFeaturesToTrack(img0, 80, 0.1, 7, blockSize=7)[:, 0, :]
        keep = ((ref0[:, 0] > 25) & (ref0[:, 0] < 135) & (ref0[:, 1] > 25) & (ref0[:, 1] < 95))
        ref0 = ref0[keep].astype(np.float32)
        cv_pts, cv_st, _ = cv2.calcOpticalFlowPyrLK(
            img0, img1, ref0.reshape(-1, 1, 2), None, winSize=(21, 21),
            criteria=(cv2.TERM_CRITERIA_EPS | cv2.TERM_CRITERIA_COUNT, 30, 0.01))
        ours = lucas_kanade_track(jnp.asarray(img0), jnp.asarray(img1), jnp.asarray(ref0))
        both = np.asarray(ours.status) & (cv_st[:, 0] == 1)
        diff = np.linalg.norm(np.asarray(ours.points)[both] - cv_pts[both, 0], axis=1)
        assert np.median(diff) < 0.2
        assert both.mean() > 0.8

    def test_status_false_for_flat_regions(self):
        img = np.full((80, 80), 128, np.uint8)
        pts = jnp.asarray(np.array([[40.0, 40.0], [20.0, 20.0]], np.float32))
        res = lucas_kanade_track(jnp.asarray(img), jnp.asarray(img), pts)
        assert not bool(np.asarray(res.status).any())

    def test_out_of_image_point_flagged(self):
        img0 = textured(seed=5)
        img1 = np.roll(img0, 50, axis=1)  # big shift pushes trackers around
        pts = jnp.asarray(np.array([[150.0, 60.0]], np.float32))
        res = lucas_kanade_track(jnp.asarray(img0), jnp.asarray(img1), pts)
        # either tracked inside or properly flagged; just assert no NaN
        assert np.isfinite(np.asarray(res.points)).all()


class TestFeaturePool:
    def test_replenish_fills_invalid_slots(self):
        img = textured(seed=6)
        k = 64
        pool = FeaturePool(points=jnp.zeros((k, 2), jnp.float32),
                           valid=jnp.zeros((k,), bool))
        pool2 = replenish_features(pool, jnp.asarray(img), max_corners=k)
        assert int(jnp.sum(pool2.valid)) > 0
        # previously valid points survive
        pool3 = replenish_features(pool2, jnp.asarray(img), max_corners=k)
        np.testing.assert_array_equal(
            np.asarray(pool2.points)[np.asarray(pool2.valid)],
            np.asarray(pool3.points)[np.asarray(pool2.valid)])
