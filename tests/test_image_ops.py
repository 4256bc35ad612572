"""Image-op parity tests against numpy/OpenCV oracles (reference semantics)."""
import numpy as np
import pytest

import jax.numpy as jnp

from mav_detection_tpu.ops.image import (
    get_magnitude,
    get_rho,
    calculate_tpr_fpr,
    calculate_tpr_fpr_batch,
    flow_to_color,
    to_int,
    to_rgb,
    apply_colormap,
    get_simple_bounding_box,
    get_simple_bounding_box_device,
)
from mav_detection_tpu.ops.image.metrics import masked_mean_flow
from mav_detection_tpu.ops.image.boxes import box_array_to_rectangle


class TestMetrics:
    def test_magnitude_matches_numpy(self, rng):
        flow = rng.normal(size=(32, 48, 2)).astype(np.float32)
        ours = np.asarray(get_magnitude(jnp.asarray(flow)))
        ref = np.linalg.norm(flow, axis=-1)
        np.testing.assert_allclose(ours, ref, rtol=1e-6)

    def test_rho_matches_numpy(self, rng):
        flow = rng.normal(size=(16, 16, 2)).astype(np.float32)
        ours = np.asarray(get_rho(jnp.asarray(flow)))
        ref = np.arctan2(flow[..., 1], flow[..., 0])
        np.testing.assert_allclose(ours, ref, rtol=1e-5)

    def _ref_tpr_fpr(self, gt_img, img):
        # verbatim math of /root/reference/src/im_helpers.py:244-252
        gt_img = gt_img.astype(np.int64)
        img = img.astype(np.int64)
        positives = np.sum(gt_img > 127)
        negatives = np.sum((255 - gt_img) > 127)
        true_positives = np.sum((gt_img * img) > 127)
        false_positives = np.sum(((255 - gt_img) * img) > 127)
        return true_positives / positives, false_positives / negatives

    def test_tpr_fpr_parity(self, rng):
        gt = (rng.random((64, 64)) > 0.8).astype(np.uint8) * 255
        est = (rng.random((64, 64)) > 0.7).astype(np.uint8) * 255
        tpr, fpr = calculate_tpr_fpr(jnp.asarray(gt), jnp.asarray(est))
        ref_tpr, ref_fpr = self._ref_tpr_fpr(gt, est)
        assert float(tpr) == pytest.approx(ref_tpr)
        assert float(fpr) == pytest.approx(ref_fpr)

    def test_tpr_fpr_perfect_detection(self):
        gt = np.zeros((8, 8), np.uint8)
        gt[2:4, 2:4] = 255
        tpr, fpr = calculate_tpr_fpr(jnp.asarray(gt), jnp.asarray(gt))
        assert float(tpr) == 1.0
        assert float(fpr) == 0.0

    def test_tpr_fpr_batch(self, rng):
        gts = (rng.random((3, 16, 16)) > 0.8).astype(np.uint8) * 255
        ests = (rng.random((3, 16, 16)) > 0.7).astype(np.uint8) * 255
        tprs, fprs = calculate_tpr_fpr_batch(jnp.asarray(gts), jnp.asarray(ests))
        for i in range(3):
            ref_tpr, ref_fpr = self._ref_tpr_fpr(gts[i], ests[i])
            assert float(tprs[i]) == pytest.approx(ref_tpr)
            assert float(fprs[i]) == pytest.approx(ref_fpr)

    def test_masked_mean_flow(self, rng):
        flow = rng.normal(size=(10, 10, 2)).astype(np.float32)
        mask = rng.random((10, 10)) > 0.5
        ours = np.asarray(masked_mean_flow(jnp.asarray(flow), jnp.asarray(mask)))
        ref = np.average(flow[mask], axis=0)
        np.testing.assert_allclose(ours, ref, rtol=1e-5)


class TestVisualize:
    def test_flow_to_color_range_and_shape(self, rng):
        flow = rng.normal(size=(20, 20, 2)).astype(np.float32) * 3
        img = flow_to_color(flow)
        assert img.shape == (20, 20, 3)
        assert img.dtype == np.uint8

    def test_flow_to_color_zero_flow_is_white(self):
        img = flow_to_color(np.zeros((4, 4, 2), np.float32))
        # zero flow maps to (near) white in the Middlebury scheme
        assert np.all(img >= 250)

    def test_flow_vis_oracle(self):
        """Check against flow_vis package if installed, else skip."""
        flow_vis = pytest.importorskip("flow_vis")
        rng = np.random.default_rng(0)
        flow = rng.normal(size=(16, 16, 2)).astype(np.float32)
        theirs = flow_vis.flow_to_color(flow, convert_to_bgr=True)
        ours = flow_to_color(flow, convert_to_bgr=True)
        assert np.mean(np.abs(theirs.astype(int) - ours.astype(int))) < 1.0

    def test_to_int_normalize(self):
        img = np.array([[0.0, 0.5, 1.0]])
        out = to_int(img, np.uint8, normalize=True)
        np.testing.assert_array_equal(out, [[0, 128, 255]])

    def test_to_rgb_shape(self):
        img = np.random.rand(5, 6).astype(np.float32)
        out = to_rgb(img)
        assert out.shape == (5, 6, 3)
        assert out.dtype == np.uint8

    def test_apply_colormap_float_input(self):
        img = np.random.rand(8, 8).astype(np.float32) * 180
        out = apply_colormap(img, max_value=180.0)
        assert out.shape == (8, 8, 3)


class TestBoundingBox:
    def _ref_bbox(self, img):
        # verbatim loops of /root/reference/src/im_helpers.py:55-84
        height, width = img.shape[:2]
        start_x, start_y, end_x, end_y = -1, -1, -1, -1
        threshold = 0.1 * np.max(img)
        mask = img > threshold
        for y in range(height):
            if np.sum(mask[y, ...]) > 0:
                end_y = y
                if start_y == -1:
                    start_y = y
        for x in range(width):
            if np.sum(mask[:, x, ...]) > 0:
                end_x = x
                if start_x == -1:
                    start_x = x
        return start_x, start_y, end_x, end_y

    def test_parity_with_reference_loops(self, rng):
        img = np.zeros((32, 40), np.uint8)
        img[10:15, 20:30] = 200
        img[12, 25] = 255
        ours = get_simple_bounding_box(img)
        sx, sy, ex, ey = self._ref_bbox(img)
        assert ours.get_topleft() == (sx, sy)
        assert ours.get_bottomright() == (ex, ey)

    def test_device_variant_matches_host(self, rng):
        img = (rng.random((24, 24)) * 255).astype(np.uint8)
        img[img < 200] = 0
        host = get_simple_bounding_box(img)
        dev = box_array_to_rectangle(np.asarray(get_simple_bounding_box_device(jnp.asarray(img))))
        assert host.get_topleft() == dev.get_topleft()
        assert host.get_bottomright() == dev.get_bottomright()

    def test_empty_image(self):
        img = np.zeros((8, 8), np.uint8)
        dev = np.asarray(get_simple_bounding_box_device(jnp.asarray(img)))
        np.testing.assert_array_equal(dev, [-1, -1, -1, -1])
