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
    """Shared replicate-border bilinear sampler (ops.geometry.warp)."""
    from mav_detection_tpu.ops.geometry.warp import sample_bilinear_replicate

    return sample_bilinear_replicate(fmap, cx, cy)


def _drone_sprite(xs, ys, pos, radius, style):
    """Textured disc: mask + grayscale pattern. ``style`` = (base, amp,
    freq, phase_x, phase_y) randomizes appearance around the host fixture's
    fixed 45 + 20 sin(0.9 dx) cos(0.9 dy) pattern (data/synthetic.py) so the
    detector can't overfit one exact sprite."""
    dx = xs - pos[0]
    dy = ys - pos[1]
    mask = dx ** 2 + dy ** 2 <= radius ** 2
    sprite = style[0] + style[1] * (jnp.sin(style[2] * dx + style[3])
                                    * jnp.cos(style[2] * dy + style[4]))
    return mask, sprite


def generate_scene(key: jax.Array, h: int, w: int,
                   sin_blend: float = 0.6,
                   pan_max: float = 0.0) -> SynthScene:
    """Sample one scene. All shapes static; every parameter traced.

    Textures, brightness ranges, sprite style, and noise are domain-
    randomized (continuous blur-spectrum mixing, traced range endpoints):
    measured on the held-out host fixture, a generator with FIXED values
    overfits within a few thousand steps (sky TPR collapsed 0.87 -> 0.0
    between 1.5k and 8k steps before randomization).

    ``sin_blend`` caps the sinusoidal-grid texture family's blend weight
    (cross-domain broadening); 0 restores the pure blurred-noise family the
    in-family eval fixture is drawn from — fine-tune polishes anneal it down
    when in-family EPE drifts.

    ``pan_max`` > 0 adds a per-axis uniform camera pan of up to that many
    pixels to the whole flow field (at long range a yaw/pitch rotation IS a
    near-uniform image translation). The expansion+rotation family above
    tops out ~3 px at the training scale, and the round-3 checkpoint
    measurably COLLAPSED on |flow| >= 4 px at any resolution (PERF.md
    "RAFT motion cap") — this is the large-motion curriculum that fixes it.
    The scene is rendered inflated by ``pan_max + 2`` px on every side and
    cropped back, so the pan never shows the warp's replicate-border smear
    (which would be mislabeled supervision: smeared texture has zero
    apparent motion while the GT says ``pan``). With pan the returned
    ``foe`` no longer equals the flow field's zero (the pan shifts it);
    RAFT training does not consume ``foe``."""
    # pad covers the pan plus the expansion/rotation field's own reach at
    # this scale (~4-5 px at 128-160 px frames, expansion <= 0.022)
    pad = int(-(-pan_max // 1)) + 8 if pan_max > 0.0 else 0
    hc, wc = h, w                     # crop (= output) size
    h, w = h + 2 * pad, w + 2 * pad   # render size
    ks = jax.random.split(key, 20)
    xs = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
    ys = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)

    def mixed_texture(key_noise, key_mix, sig_a, sig_b, lo_rng, hi_rng):
        """Blur-spectrum + brightness-range randomization: a traced convex
        mix of two fixed-sigma blurs varies the spectrum continuously with
        static kernel shapes. A third, sinusoidal-grid family (the mock
        simulator's ground style — round-3 cross-domain broadening) blends
        in with a traced weight so the nets can't overfit the blurred-noise
        spectrum alone."""
        kn, km, ksin = jax.random.split(key_mix, 3)
        noise = jax.random.uniform(key_noise, (h, w))
        a = jax.random.uniform(kn, ())
        tex = a * _blur(noise, sig_a) + (1 - a) * _blur(noise, sig_b)
        sp = jax.random.uniform(ksin, (6,))
        kxy = 0.02 + 0.25 * sp[:2]                  # rad/px wavenumbers
        sin_tex = (jnp.sin(kxy[0] * xs + sp[2] * 6.2832)
                   * jnp.cos(kxy[1] * ys + sp[3] * 6.2832)
                   + 0.5 * jnp.sin(2.7 * kxy[1] * xs + 1.9 * kxy[0] * ys))
        b = sin_blend * sp[4]                        # sinusoid blend 0..cap
        tex = (1 - b) * _normalize(tex, 0.0, 1.0) + b * _normalize(sin_tex, 0.0, 1.0)
        u = jax.random.uniform(km, (2,))
        lo = lo_rng[0] + u[0] * (lo_rng[1] - lo_rng[0])
        hi = hi_rng[0] + u[1] * (hi_rng[1] - hi_rng[0])
        return _normalize(tex, lo, hi)

    # -- background: ground + sky band composited in image space
    ground = mixed_texture(ks[0], ks[13], 1.0, 2.5, (10.0, 40.0), (170.0, 245.0))
    sky_tex = mixed_texture(ks[1], ks[14], 3.0, 6.0, (130.0, 170.0), (225.0, 250.0))
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
    pan = jax.random.uniform(ks[16], (2,), minval=-pan_max, maxval=pan_max)
    bg_flow = radial + rot + pan[None, None]

    # -- render frame 2: img2(y) = img1(f^-1(y)), f(x) = x + flow(x);
    #    invert by fixed point (flow is small and smooth, 3 rounds suffice)
    inv = bg_flow
    for _ in range(3):
        fx = _sample_bilinear(bg_flow, xs - inv[..., 0], ys - inv[..., 1])
        inv = fx
    bg2 = _sample_bilinear(bg1, xs - inv[..., 0], ys - inv[..., 1])

    # -- intruder disc on an independent linear path (min radius 3: the
    # cross-domain scenes carry ~3-4 px intruders and the round-2 net,
    # trained on >=5 px, washed their motion out — tools/cross_domain_eval)
    radius = jax.random.uniform(ks[7], (), minval=3.0, maxval=14.0)
    margin = 0.12
    pos1 = jnp.stack([
        pad + jax.random.uniform(ks[8], (), minval=margin,
                                 maxval=1 - margin) * wc,
        pad + jax.random.uniform(ks[9], (), minval=margin,
                                 maxval=1 - margin) * hc,
    ])
    # the intruder's APPARENT motion is its own velocity plus the camera
    # pan (camera rotation moves every scene point)
    vel = jax.random.uniform(ks[10], (2,), minval=-5.0, maxval=5.0) + pan
    su = jax.random.uniform(ks[15], (5,))
    style = (30.0 + 40.0 * su[0],          # base brightness 30..70
             10.0 + 20.0 * su[1],          # pattern amplitude 10..30
             0.5 + 0.8 * su[2],            # pattern frequency 0.5..1.3
             su[3] * 6.2832, su[4] * 6.2832)
    mask1, sprite1 = _drone_sprite(xs, ys, pos1, radius, style)
    mask2, sprite2 = _drone_sprite(xs, ys, pos1 + vel, radius, style)
    img1 = jnp.where(mask1, sprite1, bg1)
    img2 = jnp.where(mask2, sprite2, bg2)
    flow = jnp.where(mask1[..., None], vel[None, None], bg_flow)

    # -- photometric augmentation (shared by the pair, like exposure drift);
    # noise is OFF for 40% of scenes (the host fixture renders noiseless)
    aug = jax.random.uniform(ks[11], (4,))
    gain = 0.75 + 0.5 * aug[0]
    bias = (aug[1] - 0.5) * 40.0
    noise_amp = aug[2] * 2.5 * (aug[3] > 0.4)
    n1, n2 = jax.random.normal(ks[12], (2, h, w))
    img1 = jnp.clip(img1 * gain + bias + noise_amp * n1, 0, 255)
    img2 = jnp.clip(img2 * gain + bias + noise_amp * n2, 0, 255)

    if pad:
        crop = lambda a: a[pad:pad + hc, pad:pad + wc]
        img1, img2, flow = crop(img1), crop(img2), crop(flow)
        sky_rows, mask1 = crop(sky_rows), crop(mask1)
        pos1 = pos1 - pad
        foe = foe - pad
    box = jnp.concatenate([pos1, jnp.stack([2 * radius, 2 * radius])])
    return SynthScene(img1=img1, img2=img2, flow=flow, sky=sky_rows,
                      seg=mask1, box=box, foe=foe, omega=omega, dt=dt)


@functools.partial(jax.jit, static_argnames=("batch", "h", "w", "pan_max"))
def generate_batch(key: jax.Array, batch: int, h: int, w: int,
                   pan_max: float = 0.0) -> SynthScene:
    """(batch,) of scenes, fully on device."""
    return jax.vmap(lambda k: generate_scene(k, h, w, pan_max=pan_max))(
        jax.random.split(key, batch))
