"""Per-mode NN imagery: device/host transform parity + per-mode checkpoint
resolution (reference: per-mode ``yolo_train_weights`` run-ids,
``/root/reference/settings.json:2-4``; imagery transforms
``processor.py:114-131``)."""
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mav_detection_tpu.ops.image import (
    flow_radial_device,
    flow_to_color,
    flow_to_color_device,
)
from mav_detection_tpu.ops.image.visualize import get_flow_radial
from mav_detection_tpu.pipeline.mode_imagery import (
    mode_image_device,
    mode_image_host,
)


@pytest.fixture(scope="module")
def flow():
    rng = np.random.default_rng(3)
    return rng.normal(0, 3, (48, 64, 2)).astype(np.float32)


class TestDeviceFlowVis:
    def test_flow_to_color_device_bit_exact(self, flow):
        host = flow_to_color(flow)
        dev = np.asarray(flow_to_color_device(jnp.asarray(flow)))
        np.testing.assert_array_equal(host.astype(np.int32),
                                      dev.astype(np.int32))

    def test_flow_to_color_device_handles_nan(self, flow):
        bad = flow.copy()
        bad[0, 0] = np.nan
        out = np.asarray(flow_to_color_device(jnp.asarray(bad)))
        assert np.isfinite(out).all()

    def test_flow_radial_device_matches_host_composite(self, flow):
        """Device radial = host get_flow_radial(flow_to_color(flow)) wherever
        magnitude is large enough that uint8 quantization preserves hue."""
        host = get_flow_radial(flow_to_color(flow)).astype(np.int32)
        dev = np.asarray(flow_radial_device(jnp.asarray(flow))).astype(np.int32)
        rad = np.linalg.norm(flow, axis=-1)
        m = rad >= 0.2 * rad.max()
        assert np.abs(host[m] - dev[m]).max() <= 8

    def test_flow_radial_device_is_pure_hue(self, flow):
        """S = V = 1: every pixel has a ~255 max channel and a ~0 min."""
        dev = np.asarray(flow_radial_device(jnp.asarray(flow)))
        assert dev.max(axis=-1).min() >= 254
        assert dev.min(axis=-1).max() <= 1


class TestModeImage:
    def test_host_device_agree_flow_uv(self, flow):
        frame = np.zeros(flow.shape[:2] + (3,), np.uint8)
        host = mode_image_host(frame, flow, "FLOW_UV")
        dev = np.asarray(mode_image_device(
            jnp.zeros(flow.shape[:2]), jnp.asarray(flow), "FLOW_UV",
            jax.random.PRNGKey(0)))
        np.testing.assert_array_equal(host.astype(np.int32),
                                      dev.astype(np.int32))

    def test_appearance_rgb_passthrough(self, flow):
        frame = np.full(flow.shape[:2] + (3,), 7, np.uint8)
        assert mode_image_host(frame, flow, "APPEARANCE_RGB") is frame
        gray = jnp.full(flow.shape[:2], 7.0)
        dev = np.asarray(mode_image_device(gray, jnp.asarray(flow),
                                           "APPEARANCE_RGB",
                                           jax.random.PRNGKey(0)))
        assert dev.shape == flow.shape[:2] + (3,)
        np.testing.assert_allclose(dev, 7.0)

    def test_foe_residual_highlights_intruder(self):
        """Ego-motion residual: a global affine field with a deviating disc
        -> residual magnitude bright on the disc, dark on the background."""
        h, w = 64, 80
        xs, ys = np.meshgrid(np.arange(w, dtype=np.float32),
                             np.arange(h, dtype=np.float32))
        flow = np.stack([0.02 * (xs - 40.0), 0.02 * (ys - 32.0)], -1)
        disc = (xs - 20) ** 2 + (ys - 44) ** 2 <= 36
        flow[disc] = (4.0, -3.0)
        for img in (
            mode_image_host(np.zeros((h, w, 3), np.uint8), flow,
                            "FLOW_FOE_YOLO", seed=1),
            np.asarray(mode_image_device(jnp.zeros((h, w)),
                                         jnp.asarray(flow), "FLOW_FOE_YOLO",
                                         jax.random.PRNGKey(1))),
        ):
            on = float(img[disc].mean())
            off = float(img[~disc].mean())
            assert on > 10 * max(off, 1e-3), (on, off)

    def test_unknown_mode_raises(self, flow):
        with pytest.raises(ValueError):
            mode_image_device(jnp.zeros(flow.shape[:2]), jnp.asarray(flow),
                              "FLOW_FOE_CLUSTERING", jax.random.PRNGKey(0))


class TestPerModeCheckpoints:
    def test_name_mapping(self):
        from mav_detection_tpu.models import pretrained

        assert pretrained.yolo_checkpoint_name(None) == "yolo"
        assert pretrained.yolo_checkpoint_name("APPEARANCE_RGB") == "yolo"
        assert pretrained.yolo_checkpoint_name("FLOW_UV") == "yolo_flow_uv"
        assert (pretrained.yolo_checkpoint_name("FLOW_FOE_YOLO")
                == "yolo_flow_foe_yolo")

    def test_fallback_to_rgb_weights(self, tmp_path, monkeypatch):
        """A mode without a shipped per-mode checkpoint resolves to the
        RGB-trained file; a shipped per-mode file wins."""
        from flax import serialization

        from mav_detection_tpu.models import pretrained
        from mav_detection_tpu.models.yolo import create_yolo

        monkeypatch.setenv("MAV_CHECKPOINT_PATH", str(tmp_path))
        pretrained.clear_cache()
        _, params = create_yolo(jax.random.PRNGKey(0), image_hw=(64, 96))
        with open(tmp_path / "yolo.msgpack", "wb") as f:
            f.write(serialization.to_bytes(params))

        assert (pretrained.resolve_yolo_checkpoint("FLOW_UV")
                == str(tmp_path / "yolo.msgpack"))
        assert pretrained.load_yolo_params("FLOW_UV") is not None

        with open(tmp_path / "yolo_flow_uv.msgpack", "wb") as f:
            f.write(serialization.to_bytes(params))
        assert (pretrained.resolve_yolo_checkpoint("FLOW_UV")
                == str(tmp_path / "yolo_flow_uv.msgpack"))
        assert pretrained.load_yolo_params("FLOW_UV") is not None
        pretrained.clear_cache()
