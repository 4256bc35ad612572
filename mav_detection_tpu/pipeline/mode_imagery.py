"""Mode-appropriate NN imagery, shared by inference and training.

The reference trains a separate YOLOv4 weight set per detection mode
(``settings.json:2-4`` maps mode name -> run id) on imagery written by
``Processor.convert`` (``/root/reference/src/processor.py:114-131``):
APPEARANCE_RGB = raw frames, FLOW_UV = flow-vis rendering, FLOW_RADIAL = its
hue-only variant, FLOW_FOE_YOLO = ego-motion-subtracted residual magnitude —
and the validator feeds the SAME transform at inference. This module is the
single source of those transforms here:

- :func:`mode_image_host` — numpy path used by the validator on real frames
  (moved out of ``eval/validator.py`` so training can score fixtures with the
  exact inference transform).
- :func:`mode_image_device` — jittable path used by ``cli/train.py`` to
  synthesize per-mode training imagery on device, fused into the train step
  (no host round trip; the reference wrote pngs to disk instead).

Cross-implementation parity is tested in ``tests/test_mode_imagery.py``:
training sees device-rendered imagery, inference host-rendered — the tests
bound the gap.
"""
from __future__ import annotations

import numpy as np


def mode_image_host(frame: "np.ndarray", flow: "np.ndarray", mode_name: str,
                    seed: int = 0) -> "np.ndarray":
    """Numpy inference-input transform for one frame (reference
    ``processor.py:114-131``). ``mode_name`` is a ``Mode.name`` string."""
    if frame is None or mode_name == "APPEARANCE_RGB":
        return frame

    from mav_detection_tpu.ops.image import flow_to_color
    from mav_detection_tpu.ops.image.visualize import get_flow_radial

    if mode_name == "FLOW_UV":
        return flow_to_color(flow)
    if mode_name == "FLOW_RADIAL":
        return get_flow_radial(flow_to_color(flow))

    # FLOW_FOE_YOLO: affine ego-motion fit -> residual magnitude
    import jax as _jax
    import jax.numpy as _jnp

    from mav_detection_tpu.ops.geometry import (
        affine_motion_field,
        fit_affine_ransac,
        subtract_global_motion,
    )
    from mav_detection_tpu.ops.image import to_rgb

    h, w = flow.shape[:2]
    rng = np.random.default_rng(seed)
    sy = rng.integers(20, h - 20, 1000)
    sx = rng.integers(20, w - 20, 1000)
    p0 = np.stack([sx, sy], 1).astype(np.float32)
    p1 = p0 + flow[sy, sx]
    M, _ = fit_affine_ransac(_jnp.asarray(p0), _jnp.asarray(p1),
                             _jax.random.PRNGKey(seed))
    gm = affine_motion_field(M, h, w)
    _, mag = subtract_global_motion(_jnp.asarray(flow), gm)
    mag = np.asarray(mag)
    return to_rgb((mag * 255.0 / max(float(mag.max()), 1e-6)))


def mode_image_device(gray_img, flow, mode_name: str, key):
    """Jittable training-imagery transform for one scene: ``gray_img`` is an
    (h, w) grayscale frame, ``flow`` its (h, w, 2) GT flow. Returns an
    (h, w, 3) float32 image in [0, 255] matching :func:`mode_image_host`'s
    rendering of the same underlying data."""
    import jax
    import jax.numpy as jnp

    if mode_name == "APPEARANCE_RGB":
        return jnp.repeat(gray_img[..., None], 3, axis=-1)

    from mav_detection_tpu.ops.image import (
        flow_radial_device,
        flow_to_color_device,
    )

    if mode_name == "FLOW_UV":
        return flow_to_color_device(flow)
    if mode_name == "FLOW_RADIAL":
        return flow_radial_device(flow)
    if mode_name != "FLOW_FOE_YOLO":
        raise ValueError(f"no NN imagery for mode {mode_name}")

    from mav_detection_tpu.ops.geometry import (
        affine_motion_field,
        fit_affine_ransac,
        subtract_global_motion,
    )

    h, w = flow.shape[:2]
    kx, ky, kf = jax.random.split(key, 3)
    sy = jax.random.randint(ky, (1000,), 20, h - 20)
    sx = jax.random.randint(kx, (1000,), 20, w - 20)
    p0 = jnp.stack([sx, sy], axis=1).astype(jnp.float32)
    p1 = p0 + flow[sy, sx]
    M, _ = fit_affine_ransac(p0, p1, kf)
    gm = affine_motion_field(M, h, w)
    _, mag = subtract_global_motion(flow, gm)
    img = mag * (255.0 / jnp.maximum(jnp.max(mag), 1e-6))
    return jnp.repeat(img[..., None], 3, axis=-1)
