"""On-device synthetic scene generator for model training.

The host fixture (``data/synthetic.py``) renders forward-flight scenes with
analytically known flow — but through the development tunnel the host↔device
link is ~2.4 MB/s, so feeding a training loop from host-generated arrays
would starve the chip. This module synthesizes the SAME scene family entirely
in JAX: blurred-noise ground texture, a brighter/smoother sky band above a
sampled horizon, radial expansion about a sampled FoE plus the quadratic IMU
rotation field (``ops/geometry/derotation``), and a textured intruder disc on
its own linear path. One jitted call produces a whole training batch
(images, GT flow, sky mask, drone segmentation, YOLO box) with ZERO
host↔device traffic — the generator fuses into the train step.

Scene math mirrors ``data/synthetic.py`` (which itself mirrors the
reference's AirSim GT-flow construction,
``/root/reference/src/airsim_optical_flow.py:87-107``): frame2 is frame1
backward-warped through the inverse of ``x + flow(x)`` (fixed-point
inversion), the drone disc overrides flow with its own velocity, and the sky
ground truth is the static depth band.
"""
from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from mav_detection_tpu.ops.flow.farneback import _sep_correlate, _gaussian_kernel
from mav_detection_tpu.ops.geometry.derotation import derotation_field


class SynthScene(NamedTuple):
    """One generated frame pair (leading batch axis after generate_batch)."""
    img1: jax.Array    # (h, w) float32 grayscale in [0, 255]
    img2: jax.Array    # (h, w)
    flow: jax.Array    # (h, w, 2) GT flow img1 -> img2
    sky: jax.Array     # (h, w) bool sky-band ground truth (static depth band)
    seg: jax.Array     # (h, w) bool drone mask in img1
    box: jax.Array     # (4,) cx, cy, bw, bh of the drone in img1 (pixels)
    foe: jax.Array     # (2,) focus of expansion (x, y)
    omega: jax.Array   # (3,) angular difference over the frame interval (rad)
    dt: jax.Array      # () frame interval (s)


def _blur(img: jax.Array, sigma: float) -> jax.Array:
    k = _gaussian_kernel(int(sigma * 4) | 1, sigma)
    return _sep_correlate(img, k, k, "reflect", "default")


def _normalize(img: jax.Array, lo: float, hi: float) -> jax.Array:
    mn = jnp.min(img)
    rng = jnp.maximum(jnp.max(img) - mn, 1e-6)
    return (img - mn) / rng * (hi - lo) + lo


def _sample_bilinear(fmap: jax.Array, cx: jax.Array, cy: jax.Array) -> jax.Array:
    """Clamped bilinear sampling of (h, w[, c]) at float coords (replicate
    borders, unlike warp.remap_bilinear's cv2 BORDER_CONSTANT parity)."""
    h, w = fmap.shape[:2]
    x0 = jnp.floor(cx)
    y0 = jnp.floor(cy)
    fx = cx - x0
    fy = cy - y0
    x0i = jnp.clip(x0, 0, w - 1).astype(jnp.int32)
    y0i = jnp.clip(y0, 0, h - 1).astype(jnp.int32)
    x1i = jnp.minimum(x0i + 1, w - 1)
    y1i = jnp.minimum(y0i + 1, h - 1)
    if fmap.ndim == 3:
        fx = fx[..., None]
        fy = fy[..., None]
    return ((1 - fx) * (1 - fy) * fmap[y0i, x0i]
            + fx * (1 - fy) * fmap[y0i, x1i]
            + (1 - fx) * fy * fmap[y1i, x0i]
            + fx * fy * fmap[y1i, x1i])


def _drone_sprite(xs, ys, pos, radius):
    """Textured disc: mask + grayscale pattern (matches data/synthetic.py)."""
    dx = xs - pos[0]
    dy = ys - pos[1]
    mask = dx ** 2 + dy ** 2 <= radius ** 2
    sprite = 45.0 + 20.0 * jnp.sin(0.9 * dx) * jnp.cos(0.9 * dy)
    return mask, sprite


def generate_scene(key: jax.Array, h: int, w: int) -> SynthScene:
    """Sample one scene. All shapes static; every parameter traced."""
    ks = jax.random.split(key, 13)
    xs = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
    ys = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)

    # -- background: ground + sky band composited in image space
    ground = _normalize(_blur(jax.random.uniform(ks[0], (h, w)), 1.5), 20.0, 240.0)
    sky_tex = _normalize(_blur(jax.random.uniform(ks[1], (h, w)), 4.0), 150.0, 245.0)
    horizon = jax.random.uniform(ks[2], (), minval=0.2, maxval=0.45) * h
    sky_rows = ys < horizon
    bg1 = jnp.where(sky_rows, sky_tex, ground)

    # -- motion: radial expansion about the FoE + IMU rotation field
    foe = jnp.stack([
        jax.random.uniform(ks[3], (), minval=0.2, maxval=0.8) * w,
        jax.random.uniform(ks[4], (), minval=0.2, maxval=0.8) * h,
    ])
    expansion = jax.random.uniform(ks[5], (), minval=0.002, maxval=0.022)
    omega = jax.random.uniform(ks[6], (3,), minval=-0.005, maxval=0.005)
    dt = jnp.float32(0.05)
    radial = expansion * jnp.stack([xs - foe[0], ys - foe[1]], axis=-1)
    rot = derotation_field(omega / dt, dt, w, h)
    bg_flow = radial + rot

    # -- render frame 2: img2(y) = img1(f^-1(y)), f(x) = x + flow(x);
    #    invert by fixed point (flow is small and smooth, 3 rounds suffice)
    inv = bg_flow
    for _ in range(3):
        fx = _sample_bilinear(bg_flow, xs - inv[..., 0], ys - inv[..., 1])
        inv = fx
    bg2 = _sample_bilinear(bg1, xs - inv[..., 0], ys - inv[..., 1])

    # -- intruder disc on an independent linear path
    radius = jax.random.uniform(ks[7], (), minval=5.0, maxval=14.0)
    margin = 0.12
    pos1 = jnp.stack([
        jax.random.uniform(ks[8], (), minval=margin, maxval=1 - margin) * w,
        jax.random.uniform(ks[9], (), minval=margin, maxval=1 - margin) * h,
    ])
    vel = jax.random.uniform(ks[10], (2,), minval=-5.0, maxval=5.0)
    mask1, sprite1 = _drone_sprite(xs, ys, pos1, radius)
    mask2, sprite2 = _drone_sprite(xs, ys, pos1 + vel, radius)
    img1 = jnp.where(mask1, sprite1, bg1)
    img2 = jnp.where(mask2, sprite2, bg2)
    flow = jnp.where(mask1[..., None], vel[None, None], bg_flow)

    # -- photometric augmentation (shared by the pair, like exposure drift)
    aug = jax.random.uniform(ks[11], (3,))
    gain = 0.75 + 0.5 * aug[0]
    bias = (aug[1] - 0.5) * 40.0
    noise_amp = aug[2] * 2.5
    n1, n2 = jax.random.normal(ks[12], (2, h, w))
    img1 = jnp.clip(img1 * gain + bias + noise_amp * n1, 0, 255)
    img2 = jnp.clip(img2 * gain + bias + noise_amp * n2, 0, 255)

    box = jnp.concatenate([pos1, jnp.stack([2 * radius, 2 * radius])])
    return SynthScene(img1=img1, img2=img2, flow=flow, sky=sky_rows,
                      seg=mask1, box=box, foe=foe, omega=omega, dt=dt)


@functools.partial(jax.jit, static_argnames=("batch", "h", "w"))
def generate_batch(key: jax.Array, batch: int, h: int, w: int) -> SynthScene:
    """(batch,) of scenes, fully on device."""
    return jax.vmap(lambda k: generate_scene(k, h, w))(
        jax.random.split(key, batch))
