"""RAFT-style optical flow network in Flax.

Replaces the reference's FlowNet2 docker sidecar
(``/root/reference/src/datasets/dataset.py:116-123``) with an on-device
recurrent all-pairs flow estimator (Teed & Deng 2020, arXiv:2003.12039):
feature/context encoders at 1/8 resolution, a 4-level all-pairs correlation
pyramid, and a ConvGRU update operator iterated ``iters`` times.

TPU-first notes:
* The all-pairs correlation is ONE big matmul (N, C) @ (C, N) — pure MXU.
* Correlation lookup is a bounded local window (radius r) around the current
  flow target, materialized as shifted slices of the correlation pyramid —
  the same bounded-window trick XLA vectorizes well, no gathers in the inner
  loop over iterations (one gather per level per iteration, batched).
* The GRU iteration count is static so the whole refinement unrolls into one
  XLA program; ``jax.checkpoint`` on the update block keeps training memory
  linear in iterations.
* bfloat16 activations by default for MXU throughput; fp32 flow accumulators.
"""
from __future__ import annotations

import functools
import os
from dataclasses import dataclass, field
from typing import Any, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


@dataclass(frozen=True)
class RAFTConfig:
    feature_dim: int = 128
    hidden_dim: int = 96
    context_dim: int = 64
    corr_levels: int = 4
    corr_radius: int = 4
    iters: int = 12
    dtype: Any = jnp.bfloat16
    # False = memory-light lookup (banded LOCAL correlation volumes built
    # once per frame from pooled features; no (h*w)^2 volume). Required
    # above ~512p and much faster at any size (PERF.md "RAFT inference").
    materialize_corr: bool = True
    # Half-width (in 1/8-res feature pixels) of the local volumes' flow
    # coverage when materialize_corr=False: |flow| <= 8*max_flow_lookup
    # full-res px is exact; beyond it the lookup window saturates.
    max_flow_lookup: int = 2


class ResidualBlock(nn.Module):
    features: int
    stride: int = 1
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        y = nn.Conv(self.features, (3, 3), strides=(self.stride, self.stride),
                    dtype=self.dtype)(x)
        y = nn.relu(nn.GroupNorm(num_groups=8, dtype=self.dtype)(y))
        y = nn.Conv(self.features, (3, 3), dtype=self.dtype)(y)
        y = nn.GroupNorm(num_groups=8, dtype=self.dtype)(y)
        if self.stride != 1 or x.shape[-1] != self.features:
            x = nn.Conv(self.features, (1, 1), strides=(self.stride, self.stride),
                        dtype=self.dtype)(x)
        return nn.relu(x + y)


class Encoder(nn.Module):
    """1/8-resolution convolutional encoder."""
    output_dim: int
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(48, (7, 7), strides=(2, 2), dtype=self.dtype)(x)
        x = nn.relu(nn.GroupNorm(num_groups=8, dtype=self.dtype)(x))
        x = ResidualBlock(48, dtype=self.dtype)(x)
        x = ResidualBlock(72, stride=2, dtype=self.dtype)(x)
        x = ResidualBlock(96, stride=2, dtype=self.dtype)(x)
        return nn.Conv(self.output_dim, (1, 1), dtype=self.dtype)(x)


def all_pairs_correlation(f1: jax.Array, f2: jax.Array) -> jax.Array:
    """(h, w, c) x2 -> (h, w, h, w) correlation volume via one MXU matmul."""
    h, w, c = f1.shape
    a = f1.reshape(h * w, c).astype(jnp.float32)
    b = f2.reshape(h * w, c).astype(jnp.float32)
    corr = jnp.dot(a, b.T, preferred_element_type=jnp.float32)
    return corr.reshape(h, w, h, w) / jnp.sqrt(jnp.float32(c))


def build_corr_pyramid(corr: jax.Array, levels: int) -> Sequence[jax.Array]:
    """Average-pool the target dims of the volume into a pyramid."""
    h, w = corr.shape[:2]
    pyramid = [corr]
    cur = corr.reshape(h * w, corr.shape[2], corr.shape[3], 1)
    for _ in range(levels - 1):
        cur = nn.avg_pool(cur, (2, 2), strides=(2, 2))
        pyramid.append(cur.reshape(h, w, cur.shape[1], cur.shape[2]))
    return pyramid


def lookup_corr(pyramid: Sequence[jax.Array], flow: jax.Array,
                radius: int) -> jax.Array:
    """Sample each pyramid level in a (2r+1)^2 window around x + flow.

    Returns (h, w, levels*(2r+1)^2) correlation features.
    """
    h, w = flow.shape[:2]
    xs = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
    ys = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
    outs = []
    for lvl, corr in enumerate(pyramid):
        th, tw = corr.shape[2], corr.shape[3]
        scale = 2.0 ** lvl
        cx = (xs + flow[..., 0]) / scale
        cy = (ys + flow[..., 1]) / scale
        flat = corr.reshape(h * w, th, tw)
        for dy in range(-radius, radius + 1):
            for dx in range(-radius, radius + 1):
                gx = jnp.clip(cx + dx, 0, tw - 1)
                gy = jnp.clip(cy + dy, 0, th - 1)
                x0 = jnp.floor(gx)
                y0 = jnp.floor(gy)
                fx = gx - x0
                fy = gy - y0
                x0i = x0.astype(jnp.int32)
                y0i = y0.astype(jnp.int32)
                x1i = jnp.minimum(x0i + 1, tw - 1)
                y1i = jnp.minimum(y0i + 1, th - 1)
                rows = jnp.arange(h * w)
                x0f = x0i.reshape(-1)
                y0f = y0i.reshape(-1)
                x1f = x1i.reshape(-1)
                y1f = y1i.reshape(-1)
                v = ((1 - fx).reshape(-1) * (1 - fy).reshape(-1) * flat[rows, y0f, x0f]
                     + fx.reshape(-1) * (1 - fy).reshape(-1) * flat[rows, y0f, x1f]
                     + (1 - fx).reshape(-1) * fy.reshape(-1) * flat[rows, y1f, x0f]
                     + fx.reshape(-1) * fy.reshape(-1) * flat[rows, y1f, x1f])
                outs.append(v.reshape(h, w))
    return jnp.stack(outs, axis=-1)


def build_feature_pyramid(f2: jax.Array, levels: int) -> Sequence[jax.Array]:
    """Average-pooled feature maps. Because avg-pooling the correlation
    volume over target positions equals correlating against avg-pooled
    features (dot(f1, avgpool(f2)) == avgpool_target(dot(f1, f2))), this
    pyramid supports an exact, memory-light correlation lookup."""
    pyr = [f2.astype(jnp.float32)]
    for _ in range(levels - 1):
        pyr.append(nn.avg_pool(pyr[-1][None], (2, 2), strides=(2, 2))[0])
    return pyr


def _bilinear_features(fmap: jax.Array, cx: jax.Array, cy: jax.Array) -> jax.Array:
    """Sample (th, tw, c) features at float coords -> (h, w, c) — the shared
    replicate-border sampler (ops.geometry.warp)."""
    from mav_detection_tpu.ops.geometry.warp import sample_bilinear_replicate

    return sample_bilinear_replicate(fmap, cx, cy)


def lookup_corr_otf(f1: jax.Array, f2_pyramid: Sequence[jax.Array],
                    flow: jax.Array, radius: int) -> jax.Array:
    """On-the-fly correlation lookup: recompute window dot products from
    pooled features each iteration instead of materializing the
    (h*w)^2 volume (829 MB at 720p). Mathematically identical to
    ``lookup_corr`` over ``build_corr_pyramid`` up to bilinear ordering:
    here features interpolate before the dot product, which matches RAFT's
    "alternate" (memory-efficient) implementation."""
    h, w, c = f1.shape
    xs = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
    ys = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
    f1f = f1.astype(jnp.float32)
    scale_dot = 1.0 / jnp.sqrt(jnp.float32(c))
    outs = []
    for lvl, f2l in enumerate(f2_pyramid):
        s = 2.0 ** lvl
        cx = (xs + flow[..., 0]) / s
        cy = (ys + flow[..., 1]) / s
        for dy in range(-radius, radius + 1):
            for dx in range(-radius, radius + 1):
                sampled = _bilinear_features(
                    f2l, jnp.clip(cx + dx, 0, f2l.shape[1] - 1),
                    jnp.clip(cy + dy, 0, f2l.shape[0] - 1))
                outs.append(jnp.sum(f1f * sampled, axis=-1) * scale_dot)
    return jnp.stack(outs, axis=-1)


def build_local_corr_volumes(f1: jax.Array, f2_pyramid: Sequence[jax.Array],
                             radius: int, max_flow: int
                             ) -> Sequence[jax.Array]:
    """Per-frame LOCAL correlation volumes: D_l[y, x, u, v] =
    <f1(y, x), f2_l(clip(y//s + u + lo), clip(x//s + v + lo))> / sqrt(C)
    with the (u, v) window sized to cover |flow| <= ``max_flow`` feature px
    plus the lookup radius (lo = -(ceil(max_flow/s) + 1 + radius)).

    Rationale (PERF.md "RAFT inference"): the per-iteration OTF lookup
    re-gathers C-dim features for all (2r+1)^2 taps — 3.7 GB of redundant
    reads per iteration at 752x480. The dot product commutes with bilinear
    interpolation, so correlating ONCE against every integer shift in range
    moves all feature traffic to a per-frame precompute; each GRU iteration
    then only interpolates scalars out of these small volumes.

    MXU formulation (PERF.md "RAFT volume matmul"): D[y, x, u, v] is a
    channel dot product between full-res rows of f1 and pooled rows of f2,
    so for each row shift u ONE batched matmul (ky, s*kx*s, C) @ (ky, C, TWp)
    produces every column product at once; the needed band x//s + v is then
    peeled out with a skewed reshape (pad the flat row to stride TWp+1 so
    consecutive (X, v) diagonals become contiguous) — one unit-stride slice,
    no gathers. ~7x faster than the elementwise multiply-reduce planes this
    replaces (VPU-bound at 850 shifted (h, w, C) passes)."""
    h, w, c = f1.shape
    f1f = f1.astype(jnp.float32)
    scale_dot = 1.0 / jnp.sqrt(jnp.float32(c))
    vols = []
    for lvl, f2l in enumerate(f2_pyramid):
        s = 2 ** lvl
        R = -(-max_flow // s) + 1 + radius       # u, v in [-R, R + 1]
        TH, TW = f2l.shape[:2]
        pad = R + 2
        f2p = jnp.pad(f2l.astype(jnp.float32),
                      ((pad, pad), (pad, pad), (0, 0)), mode="edge")
        # ceil sizes: ragged pixels (y//s beyond the floor-pooled rows) keep
        # their TRUE base index so clip(y//s + u) matches the OTF lookup —
        # the edge padding of f2p supplies the clamped values
        ky, kx = -(-h // s), -(-w // s)
        U = 2 * R + 2
        TWp = TW + 2 * pad
        # full-res pixels grouped by pooled row: (ky, s*kx*s, c), zero-padded
        # ragged tails crop away after extraction
        f1g = jnp.pad(f1f, ((0, ky * s - h), (0, kx * s - w), (0, 0)))
        f1g = f1g.reshape(ky, s, kx * s, c).reshape(ky, s * kx * s, c)
        per_u = []
        for ui in range(U):
            rows = jax.lax.slice(f2p, (ui + 2, 0, 0),
                                 (ui + 2 + ky, TWp, c))     # (ky, TWp, c)
            m = jnp.einsum("ypc,yzc->ypz", f1g, rows,
                           precision=jax.lax.Precision.HIGHEST,
                           preferred_element_type=jnp.float32)
            # m[Y, (i, X, j), Z]; want band Z = X + v + 2, v+R in [0, U)
            m = m.reshape(ky, s, kx, s, TWp).transpose(0, 1, 3, 2, 4)
            m = m.reshape(ky, s, s, kx * TWp)
            # skewed reshape: row stride TWp+1 makes Z - X constant per col
            m = jnp.pad(m, ((0, 0), (0, 0), (0, 0), (0, kx + 2)))
            m = jax.lax.slice_in_dim(m, 2, 2 + kx * (TWp + 1), axis=3)
            band = m.reshape(ky, s, s, kx, TWp + 1)[..., :U]
            # (ky, s, s, kx, U) -> (h, w, U)
            band = band.transpose(0, 1, 3, 2, 4).reshape(ky * s, kx * s, U)
            per_u.append(band[:h, :w])
        vols.append(jnp.stack(per_u, axis=2) * scale_dot)   # (h, w, U, U)
    return tuple(vols)


def lookup_corr_volumes(vols: Sequence[jax.Array], f2_shapes,
                        flow: jax.Array, radius: int) -> jax.Array:
    """Window lookup out of precomputed local volumes — bit-equal to
    ``lookup_corr_otf`` for |flow| within the volumes' coverage; beyond it
    the window saturates at the volume edge (graceful, like the Farneback
    warp's max_shift). Returns (h, w, levels*(2r+1)^2)."""
    h, w = flow.shape[:2]
    yf = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
    xf = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
    d_off = jnp.arange(-radius, radius + 1)
    outs = []
    for lvl, (D, (TH, TW)) in enumerate(zip(vols, f2_shapes)):
        s = float(2 ** lvl)
        U = D.shape[-1]
        lo = -(U - 2) // 2
        ay = (jnp.mod(yf, s) + flow[..., 1]) / s
        ax = (jnp.mod(xf, s) + flow[..., 0]) / s
        sy = jnp.floor(ay)
        sx = jnp.floor(ax)
        gy = ay - sy
        gx = ax - sx
        cy = (yf + flow[..., 1]) / s
        cx = (xf + flow[..., 0]) / s
        # per-tap effective fractions: zero when the (clipped) tap coordinate
        # pins to the map border — reproduces lookup_corr_otf's pre-floor clip
        gye = jnp.where((cy[..., None] + d_off >= 0)
                        & (cy[..., None] + d_off <= TH - 1),
                        gy[..., None], 0.0)                      # (h, w, 9)
        gxe = jnp.where((cx[..., None] + d_off >= 0)
                        & (cx[..., None] + d_off <= TW - 1),
                        gx[..., None], 0.0)
        # Gather-free extraction: XLA gathers are bandwidth-catastrophic on
        # this toolchain (take_along_axis measured 71 ms/iter here), so the
        # bilinear tap selection becomes two tiny per-pixel einsums against
        # one-hot selector stacks — Sy/Sx fold the integer-row choice AND
        # the interpolation weight into a (U, taps) matrix per pixel.
        n = 2 * radius + 1
        u_iota = jnp.arange(U)

        def selector(s_i, g_eff):
            j0 = jnp.clip(s_i[..., None] + d_off - lo, 0, U - 1)
            j1 = jnp.clip(s_i[..., None] + d_off + 1 - lo, 0, U - 1)
            one0 = (u_iota[:, None] == j0[..., None, :]).astype(jnp.float32)
            one1 = (u_iota[:, None] == j1[..., None, :]).astype(jnp.float32)
            return ((1.0 - g_eff)[..., None, :] * one0
                    + g_eff[..., None, :] * one1)          # (h, w, U, n)

        Sy = selector(sy.astype(jnp.int32), gye)
        Sx = selector(sx.astype(jnp.int32), gxe)
        # broadcast-multiply-reduce instead of einsum: the equivalent tiny
        # batched dot_generals miscompile to all-NaN at batch>=8 under vmap
        # on the current TPU toolchain (measured; batch 2/4 fine) — the
        # explicit form lowers to plain VPU fusions and is just as fast
        t = jnp.sum(D[..., :, :, None] * Sx[..., None, :, :], axis=-2)
        out = jnp.sum(Sy[..., :, :, None] * t[..., :, None, :], axis=-3)
        outs.append(out.reshape(h, w, n * n))
    return jnp.concatenate(outs, axis=-1)


class ConvGRU(nn.Module):
    hidden_dim: int
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, h, x):
        hx = jnp.concatenate([h, x], axis=-1)
        z = nn.sigmoid(nn.Conv(self.hidden_dim, (3, 3), dtype=self.dtype)(hx))
        r = nn.sigmoid(nn.Conv(self.hidden_dim, (3, 3), dtype=self.dtype)(hx))
        q = nn.tanh(nn.Conv(self.hidden_dim, (3, 3), dtype=self.dtype)(
            jnp.concatenate([r * h, x], axis=-1)))
        return (1 - z) * h + z * q


class UpdateBlock(nn.Module):
    """GRU update + flow head. The convex-upsample MASK head is NOT here:
    it depends only on the hidden state, so it lives at the RAFT level
    (``mask_hidden``/``mask_head``) and runs per-iteration only when the
    training sequence loss needs it — inside the scan it cost a
    (iters, h, w, 576) f32 stack (~78 MB of HBM traffic per frame at
    752x480) even for final-only inference. Pre-hoist checkpoints
    (refine/update/{Conv_6, mask_head}) are migrated on load
    (models/pretrained.py)."""
    config: RAFTConfig

    @nn.compact
    def __call__(self, hidden, context, corr_feat, flow):
        cfg = self.config
        dt = cfg.dtype
        c = nn.relu(nn.Conv(96, (1, 1), dtype=dt)(corr_feat.astype(dt)))
        c = nn.relu(nn.Conv(64, (3, 3), dtype=dt)(c))
        f = nn.relu(nn.Conv(64, (7, 7), dtype=dt)(flow.astype(dt)))
        f = nn.relu(nn.Conv(32, (3, 3), dtype=dt)(f))
        motion = nn.Conv(80, (3, 3), dtype=dt)(jnp.concatenate([c, f], axis=-1))
        motion = jnp.concatenate([nn.relu(motion), flow.astype(dt)], axis=-1)

        inp = jnp.concatenate([motion, context], axis=-1)
        hidden = ConvGRU(cfg.hidden_dim, dtype=dt)(hidden, inp)

        dflow = nn.Conv(2, (3, 3), dtype=jnp.float32,
                        name="flow_head")(nn.relu(
                            nn.Conv(128, (3, 3), dtype=dt)(hidden)).astype(jnp.float32))
        return hidden, dflow


def convex_upsample(flow: jax.Array, mask: jax.Array) -> jax.Array:
    """8x upsample flow with learned convex combinations of 3x3 neighbors.

    The combination is a broadcast multiply-reduce, NOT an einsum: the
    natural ``(h*w)``-batched (64, 9) @ (9, 2) dot_generals are pathological
    on TPU (tiny MXU tiles) and einsum silently ran the product in bf16 —
    measured 0.60 -> 0.30 ms/frame at 752x480 batch-8 AND exact f32 after
    the rewrite (PERF.md "convex upsample")."""
    h, w, _ = flow.shape
    m = jax.nn.softmax(mask.reshape(h, w, 64, 9), axis=-1)
    # 3x3 neighborhoods of the coarse flow (x8 scaling of the values)
    pads = jnp.pad(flow * 8.0, ((1, 1), (1, 1), (0, 0)), mode="edge")
    neighbors = jnp.stack([
        pads[dy:dy + h, dx:dx + w] for dy in range(3) for dx in range(3)
    ], axis=-1)  # (h, w, 2, 9)
    up = jnp.sum(m[..., None, :] * neighbors[..., None, :, :], axis=-1)
    return (up.reshape(h, w, 8, 8, 2)
            .transpose(0, 2, 1, 3, 4).reshape(h * 8, w * 8, 2))


class _RefineStep(nn.Module):
    """One GRU refinement iteration, shaped for ``nn.scan``: weights are
    broadcast across iterations, so XLA compiles the body ONCE instead of
    unrolling ``iters`` copies (12x smaller program, much faster compiles)."""
    config: RAFTConfig

    @nn.compact
    def __call__(self, carry, context, pyramid, vols):
        hidden, flow = carry
        cfg = self.config
        if cfg.materialize_corr:
            corr_feat = lookup_corr(pyramid, flow, cfg.corr_radius)
        else:
            corr_feat = lookup_corr_volumes(
                vols, [p.shape[:2] for p in pyramid], flow, cfg.corr_radius)
        hidden, dflow = UpdateBlock(cfg, name="update")(
            hidden, context, corr_feat, flow)
        flow = flow + dflow
        return (hidden, flow), (flow, hidden)


class RAFT(nn.Module):
    config: RAFTConfig = RAFTConfig()

    @nn.compact
    def __call__(self, image1: jax.Array, image2: jax.Array,
                 iters: int = 0,
                 upsample_all: bool = True) -> Tuple[jax.Array, jax.Array]:
        """(h, w, 3) uint8/float image pair -> ((h, w, 2) flow,
        (iters, h, w, 2) per-iteration upsampled predictions).

        ``upsample_all=False`` (inference) runs the learned convex upsample
        only on the FINAL iteration — the per-iteration upsamples exist only
        for the training sequence loss, and at 6 iterations they were ~48%
        of inference time (15.9 -> 8.3 ms/frame at 752x480 on v5e, PERF.md
        "RAFT final-only upsample") — and returns the final prediction alone
        as a (1, h, w, 2) second output."""
        cfg = self.config
        iters = iters or cfg.iters
        x1 = image1.astype(jnp.float32) / 127.5 - 1.0
        x2 = image2.astype(jnp.float32) / 127.5 - 1.0

        fnet = Encoder(cfg.feature_dim, dtype=cfg.dtype, name="fnet")
        f1 = fnet(x1)
        f2 = fnet(x2)
        cnet = Encoder(cfg.hidden_dim + cfg.context_dim, dtype=cfg.dtype,
                       name="cnet")(x1)
        hidden = nn.tanh(cnet[..., :cfg.hidden_dim])
        context = nn.relu(cnet[..., cfg.hidden_dim:])

        if cfg.materialize_corr:
            corr = all_pairs_correlation(f1, f2)
            pyramid = tuple(build_corr_pyramid(corr, cfg.corr_levels))
            vols: tuple = ()
        else:
            pyramid = tuple(build_feature_pyramid(f2, cfg.corr_levels))
            vols = tuple(build_local_corr_volumes(
                f1, pyramid, cfg.corr_radius, cfg.max_flow_lookup))

        h8, w8 = f1.shape[0], f1.shape[1]
        flow = jnp.zeros((h8, w8, 2), jnp.float32)

        scan = nn.scan(
            _RefineStep,
            variable_broadcast="params",
            split_rngs={"params": False},
            in_axes=(nn.broadcast, nn.broadcast, nn.broadcast),
            out_axes=0,
            length=iters,
        )
        (hidden_f, flow), (flows8, hiddens) = scan(cfg, name="refine")(
            (hidden, flow), context, pyramid, vols)

        # convex-upsample mask head, hoisted out of the scan: it reads only
        # the hidden state, so inference computes it once on the final state
        # while training applies the same (broadcast) weights to the stacked
        # per-iteration hiddens for the sequence loss
        mask_hidden = nn.Conv(128, (3, 3), dtype=cfg.dtype, name="mask_hidden")
        mask_head = nn.Conv(8 * 8 * 9, (1, 1), dtype=jnp.float32,
                            name="mask_head")
        if not upsample_all:
            mask = mask_head(nn.relu(mask_hidden(hidden_f)).astype(jnp.float32))
            final = convex_upsample(flows8[-1], mask)
            return final, final[None]
        masks = mask_head(nn.relu(mask_hidden(hiddens)).astype(jnp.float32))
        predictions = jax.vmap(convex_upsample)(flows8, masks)
        return predictions[-1], predictions


# --------------------------------------------------------------- interface
_RAFT_CACHE: dict = {}


def create_raft(key: jax.Array = None, config: RAFTConfig = RAFTConfig(),
                image_hw: Tuple[int, int] = (384, 512)):
    """Initialize (model, params). Input dims must be multiples of 8."""
    if key is None:
        key = jax.random.PRNGKey(0)
    model = RAFT(config)
    h, w = image_hw
    dummy = jnp.zeros((h, w, 3), jnp.float32)
    params = model.init(key, dummy, dummy, config.iters)
    return model, params


@functools.partial(jax.jit, static_argnames=("iters", "config"))
def _raft_apply(params, img1, img2, iters, config: RAFTConfig = RAFTConfig()):
    flow, _ = RAFT(config).apply(params, img1, img2, iters,
                                 upsample_all=False)
    return flow


# Inference default: the memory-light OTF lookup. Identical math up to
# bilinear ordering (features interpolate before the dot product — RAFT's
# own "alternate" implementation), no (h*w)^2 volume, and measured 2.4x
# faster at 752x480 on v5e: the materialized volume's per-row gathers are
# bandwidth-catastrophic at size (PERF.md "RAFT inference"). Training keeps
# the materialized volume (faster at the small training resolutions).
INFERENCE_CONFIG = RAFTConfig(materialize_corr=False)

# Product inference iteration count. Training supervises 12 GRU unrolls
# (the reference's FlowNet2 sidecar analogue per BASELINE.json), but on the
# shipped soup checkpoint FEWER iterations are strictly better where it
# matters: sweeping on hardware gave drone-region EPE 0.473 (12 it) ->
# 0.358 (6 it) in-family and bench 0.469 -> 0.339 / mock-sim EPE 0.465 ->
# 0.381 off-family, overall EPE flat, detection TPR 1.0 at both — the late
# GRU updates over-smooth small fast movers into the background flow. 6
# also halves inference cost (PERF.md "RAFT inference iterations").
PRODUCT_ITERS = 6


def raft_flow(params, image1: jax.Array, image2: jax.Array,
              iters: int = PRODUCT_ITERS,
              config: RAFTConfig = INFERENCE_CONFIG) -> jax.Array:
    """Dense flow from a trained/initialized RAFT. Pads to multiples of 8.

    Coverage cap (ADVICE r2): with the default ``INFERENCE_CONFIG`` the
    banded local volumes are exact only for |flow| <= ``8 * max_flow_lookup``
    full-res px (16 px by default) and SATURATE gracefully beyond — fast
    intruders or high-speed AirSim scenes can exceed this. Pass a config with
    a larger ``max_flow_lookup`` (cost grows ~linearly in the level-0 window
    area) or ``materialize_corr=True`` for unbounded displacement. Use
    ``flow_coverage_px``/``check_flow_saturation`` to detect the condition.
    """
    iters = iters or PRODUCT_ITERS  # 0 = product default
    h, w = image1.shape[:2]
    ph = (-h) % 8
    pw = (-w) % 8
    if image1.ndim == 2:
        image1 = jnp.repeat(image1[..., None], 3, axis=-1)
        image2 = jnp.repeat(image2[..., None], 3, axis=-1)
    if ph or pw:
        image1 = jnp.pad(image1, ((0, ph), (0, pw), (0, 0)), mode="edge")
        image2 = jnp.pad(image2, ((0, ph), (0, pw), (0, 0)), mode="edge")
    flow = _raft_apply(params, image1, image2, iters, config)
    return flow[:h, :w]


def flow_coverage_px(config: RAFTConfig = INFERENCE_CONFIG) -> float:
    """Exact-lookup coverage of the banded local volumes in full-res px
    (infinite for the materialized all-pairs volume)."""
    if config.materialize_corr:
        return float("inf")
    return 8.0 * config.max_flow_lookup


def check_flow_saturation(flow: np.ndarray,
                          config: RAFTConfig = INFERENCE_CONFIG,
                          quantile: float = 0.99) -> bool:
    """Host-side detector for the coverage cap: True (and a log warning) when
    the estimated flow's ``quantile`` magnitude reaches >= 90% of the exact
    lookup range — beyond it the estimate silently saturates (ADVICE r2)."""
    cov = flow_coverage_px(config)
    if not np.isfinite(cov):
        return False
    mag = np.linalg.norm(np.asarray(flow, np.float32), axis=-1)
    q = float(np.quantile(mag, quantile))
    if q >= 0.9 * cov:
        import logging

        logging.getLogger("mav_detection_tpu").warning(
            f"RAFT flow p{int(quantile * 100)} magnitude {q:.1f} px is near/"
            f"beyond the local-volume coverage ({cov:.0f} px): estimates "
            "saturate — raise RAFTConfig.max_flow_lookup or use "
            "materialize_corr=True")
        return True
    return False


# Level-0 all-pairs volume budget for the escalation ladder's final rung:
# (h/8*w/8)^2 f32 — 128 MB covers <=752x480; a 1920x1024 frame would need
# ~3.8 GB and stays on the banded path instead. Override via env.
_MATERIALIZE_BUDGET_BYTES = int(
    os.environ.get("MAVTPU_RAFT_MATERIALIZE_BUDGET", 512 << 20))


def _escalate_config(config: RAFTConfig,
                     image_hw: Tuple[int, int]) -> Optional[RAFTConfig]:
    """Next rung of the coverage-escalation ladder, or None when exhausted.

    Doubles ``max_flow_lookup`` (exact coverage 16 -> 32 -> 64 ... px;
    volume cost grows ~linearly in window area) until the band spans the
    frame's largest dimension — at which point no representable displacement
    can saturate — switching to the materialized all-pairs volume instead
    when that is both smaller than the remaining band AND fits the HBM
    budget."""
    if config.materialize_corr:
        return None
    h, w = int(image_hw[0]), int(image_hw[1])
    if 8.0 * config.max_flow_lookup >= float(max(h, w)):
        return None
    from dataclasses import replace

    doubled = replace(config, max_flow_lookup=config.max_flow_lookup * 2)
    n = (-(-h // 8)) * (-(-w // 8))
    band_px = 8 * (2 * doubled.max_flow_lookup + 1)
    if 4 * n * n <= _MATERIALIZE_BUDGET_BYTES and band_px >= max(h, w) // 2:
        return replace(config, materialize_corr=True)
    return doubled


def _flow_with_escalation(run, images_hw: Tuple[int, int],
                          config: RAFTConfig) -> "np.ndarray":
    """Shared auto-escalation driver (VERDICT r3 #5): run inference, and when
    the result saturates the banded-volume coverage, re-run the SAME batch on
    the next ladder rung instead of keeping saturated flow — the reference's
    FlowNet2 sidecar had no displacement cap
    (``/root/reference/src/datasets/dataset.py:116-123``), so neither does
    the product path. ``run`` maps a RAFTConfig to a flow array."""
    import logging

    log = logging.getLogger("mav_detection_tpu")
    cfg = config
    flow = np.asarray(run(cfg))
    while check_flow_saturation(flow, cfg):
        nxt = _escalate_config(cfg, images_hw)
        if nxt is None:
            log.warning(
                "RAFT coverage ladder exhausted at "
                f"max_flow_lookup={cfg.max_flow_lookup} "
                f"materialize_corr={cfg.materialize_corr} — keeping the "
                "widest-coverage estimate")
            break
        log.info(
            "RAFT flow saturated its lookup coverage — escalating to "
            f"max_flow_lookup={nxt.max_flow_lookup} "
            f"materialize_corr={nxt.materialize_corr} and re-running the "
            "batch")
        cfg = nxt
        flow = np.asarray(run(cfg))
    return flow


def raft_flow_batch_auto(images1: jax.Array, images2: jax.Array,
                         params=None, iters: int = PRODUCT_ITERS,
                         config: RAFTConfig = INFERENCE_CONFIG) -> "np.ndarray":
    """``raft_flow_batch`` + automatic coverage escalation on saturation.

    Product entry point: large motions (fast targets, low frame rates) that
    exceed the banded volumes' exact range re-run with doubled
    ``max_flow_lookup`` (or the materialized volume) until the estimate fits
    inside coverage. Returns a host array (the saturation check reduces on
    device but decides on host)."""
    hw = (int(images1.shape[1]), int(images1.shape[2]))
    return _flow_with_escalation(
        lambda cfg: raft_flow_batch(images1, images2, params, iters, cfg),
        hw, config)


def raft_flow_video_auto(frames: jax.Array, params=None,
                         iters: int = PRODUCT_ITERS,
                         config: RAFTConfig = INFERENCE_CONFIG) -> "np.ndarray":
    """``raft_flow_video`` + automatic coverage escalation on saturation."""
    hw = (int(frames.shape[1]), int(frames.shape[2]))
    return _flow_with_escalation(
        lambda cfg: raft_flow_video(frames, params, iters, cfg), hw, config)


@dataclass(frozen=True)
class TunedRAFT:
    """Resolution-keyed RAFT inference operating point (VERDICT r4 #3) —
    the net-path mirror of ``tuned_flow_params`` for Farneback
    (``ops/flow/farneback.py``). ``scale`` > 1 runs the net at
    (h // scale, w // scale) and bilinearly upsamples the flow by
    ``scale`` — RAFT's correlation features only generalize near the
    motion scale the checkpoint trained at, so hi-res frames are
    inferred at a working resolution that shrinks the scene's motion
    back into the trained range (the reference used the same pattern
    for its YOLO working resolution; our TinyYOLO does too —
    PERF.md "Sky / TinyYOLO at AirSim resolution")."""

    scale: int = 1
    iters: int = PRODUCT_ITERS
    config: RAFTConfig = INFERENCE_CONFIG


def tuned_raft_config(h: int, w: int) -> TunedRAFT:
    """Measured RAFT operating point by resolution (v5e,
    ``tools/hires_raft_probe.py``; re-pinned whenever the checkpoint
    changes — the ladder lives in PERF.md "RAFT motion cap"):

    * <= 752x480 (bench/MIDGARD scale, motion <= ~9 px): native scale,
      ``PRODUCT_ITERS`` — 6.13 ms/frame batch-8 (163 fps/chip), every
      EPE/detection gate green.
    * larger (the reference's 1920x1024 AirSim cameras, motion ~12 px):
      quarter-scale inference — measured 1.80 px EPE vs analytic GT at
      353 fps/chip, against 5.95 px at native scale (23.5 fps) and
      5.26 px at half scale: the round-4 checkpoint collapses beyond
      ~4 px of motion, and 1/4 scale shrinks the scene's ~12 px back
      inside its trained range. Re-measured against each shipped
      checkpoint; the pan-curriculum retrain is expected to move this
      point toward half/native scale.
    """
    if h * w <= 480 * 752:
        return TunedRAFT()
    return TunedRAFT(scale=4)


def _run_scaled(run_auto, images_hw: Tuple[int, int],
                tuned: Optional[TunedRAFT]) -> "np.ndarray":
    """Shared tuned-entry driver: resolve the operating point from the
    input resolution, hand the (possibly downscaled) batch to the
    auto-escalation path, and upsample the flow back. The saturation
    check inside ``run_auto`` operates at the net's working scale,
    which is where the volume coverage is defined."""
    h, w = images_hw
    t = tuned or tuned_raft_config(h, w)
    flow = run_auto(t)
    if t.scale > 1:
        from mav_detection_tpu.ops.image.resize import resize

        b = flow.shape[0]
        flow = np.asarray(resize(jnp.asarray(flow), (b, h, w))) * float(t.scale)
    return flow


def raft_flow_batch_tuned(images1: jax.Array, images2: jax.Array,
                          params=None,
                          tuned: Optional[TunedRAFT] = None) -> "np.ndarray":
    """Resolution-keyed product entry point for pair batches:
    ``tuned_raft_config`` picks the working scale/iters, inference runs
    through the coverage-escalation ladder, flow returns at the INPUT
    resolution. This is what makes ``--flow-source RAFT`` produce usable
    flow at the reference's native 1920x1024 (VERDICT r4 #3)."""
    h, w = int(images1.shape[1]), int(images1.shape[2])
    t = tuned or tuned_raft_config(h, w)
    if t.scale > 1:
        from mav_detection_tpu.ops.image.resize import resize

        b = int(images1.shape[0])
        sh, sw = h // t.scale, w // t.scale
        images1 = resize(jnp.asarray(images1, jnp.float32), (b, sh, sw))
        images2 = resize(jnp.asarray(images2, jnp.float32), (b, sh, sw))
    return _run_scaled(
        lambda tt: raft_flow_batch_auto(images1, images2, params,
                                        tt.iters, tt.config),
        (h, w), t)


def raft_flow_video_tuned(frames: jax.Array, params=None,
                          tuned: Optional[TunedRAFT] = None) -> "np.ndarray":
    """Resolution-keyed product entry point for contiguous video chains
    (shared per-frame encoding via ``raft_flow_video``)."""
    h, w = int(frames.shape[1]), int(frames.shape[2])
    t = tuned or tuned_raft_config(h, w)
    if t.scale > 1:
        from mav_detection_tpu.ops.image.resize import resize

        n = int(frames.shape[0])
        frames = resize(jnp.asarray(frames, jnp.float32),
                        (n, h // t.scale, w // t.scale))
    return _run_scaled(
        lambda tt: raft_flow_video_auto(frames, params, tt.iters, tt.config),
        (h, w), t)


# Run-time canary for the TPU vmap-batch>=8 NaN miscompile (VERDICT r2 #4):
# None = undecided, True = vmap verified finite on this toolchain, False =
# vmap miscompiles, use lax.map. Decided once per process on the first
# batch>=8 call by checking the vmap output itself (the exact product graph —
# no proxy probe); reproducer: tools/vmap_miscompile_repro.py.
#
# Exit criterion reached (VERDICT r3 #9): tools/vmap_miscompile_minimize.py
# re-materialized the historical einsum form in isolation through full
# context and measured it CLEAN (bit-identical vmap vs lax.map) at batch 4
# and 8 on the 2026-08-19 axon toolchain — the NaN class is fixed upstream,
# so this canary now selects vmap on the first call and the 15% lax.map tax
# is gone. It stays as zero-cost insurance against a toolchain regression
# (one device-reduced scalar per first call). The residual finite vmap-vs-
# map delta (~2e-2 px at isolated pixels, f32-persistent, non-growing) is
# floor/clip tap-cell flips in the lookup, not a miscompile — see the
# minimizer's stage-D classifier and PERF.md "vmap miscompile minimized".
_VMAP_BATCH8_OK: Optional[bool] = None


def _batch_shard_count(x: jax.Array) -> int:
    """How many devices the leading (batch) axis is split over (1 = local)."""
    try:
        from jax.sharding import NamedSharding

        sh = x.sharding
        if isinstance(sh, NamedSharding) and len(sh.spec):
            spec0 = sh.spec[0]
            if spec0 is None:
                return 1
            axes = spec0 if isinstance(spec0, tuple) else (spec0,)
            n = 1
            for a in axes:
                n *= int(sh.mesh.shape[a])
            return n
    except Exception:
        pass
    return 1


def raft_flow_batch(images1: jax.Array, images2: jax.Array,
                    params=None, iters: int = PRODUCT_ITERS,
                    config: RAFTConfig = INFERENCE_CONFIG) -> jax.Array:
    """Batched inference. When no params are supplied the shipped pretrained
    checkpoint (``checkpoints/raft.msgpack``, trained by ``cli.train``) loads
    automatically; without a checkpoint it falls back to fresh random params
    (valid-shaped but uninformative flow) with a warning.

    TPU batch>=8 NaN-miscompile containment (VERDICT r2 #4 / ADVICE r2): the
    composed volume-lookup graph miscompiles to NaN under vmap at batch >= 8
    on some TPU toolchains (batch 1/2/4 fine; every stage clean in isolation
    — PERF.md "RAFT inference"). Strategy:

    * the PER-DEVICE batch decides: mesh-sharded inputs whose local shard is
      < 8 keep vmap semantics, so ``--flow-source RAFT --devices N`` stays
      data-parallel (round-2 advisor finding: the old unconditional lax.map
      forced GSPMD to gather the sharded batch);
    * at local batch >= 8 a one-time canary checks the vmap output of the
      REAL inputs for finiteness — when the toolchain is fixed the 15%
      lax.map tax disappears automatically;
    * either way the product output's finiteness is asserted.
    """
    if params is None:
        from mav_detection_tpu.models import pretrained

        params = pretrained.load_raft_params()
    if params is None:
        params = _default_params(
            (images1.shape[1] + (-images1.shape[1]) % 8,
             images1.shape[2] + (-images1.shape[2]) % 8))

    def run_vmap():
        return jax.vmap(lambda a, b: raft_flow(params, a, b, iters, config))(
            images1, images2)

    def run_map():
        return jax.lax.map(
            lambda ab: raft_flow(params, ab[0], ab[1], iters, config),
            (images1, images2))

    batch = images1.shape[0]
    local_batch = -(-batch // _batch_shard_count(images1))
    return _contained_batch8(run_vmap, run_map, local_batch)


def _default_params(hw: Tuple[int, int], config: RAFTConfig = RAFTConfig()):
    """No-checkpoint fallback: fresh random params (valid-shaped but
    uninformative flow), cached per padded image size and config, with a
    warning. Shared by the pair and video entry points."""
    import logging

    logging.getLogger("mav_detection_tpu").warning(
        "no RAFT checkpoint found — using untrained weights; run "
        "`python -m mav_detection_tpu.cli.train --model raft`")
    key = ("default", hw, config)
    if key not in _RAFT_CACHE:
        _, _RAFT_CACHE[key] = create_raft(config=config, image_hw=hw)
    return _RAFT_CACHE[key]


def _contained_batch8(run_vmap, run_map, local_batch: int) -> jax.Array:
    """TPU vmap-batch>=8 miscompile containment shared by the pair and video
    paths (see ``raft_flow_batch``'s docstring for the strategy). Finiteness
    is checked per call (one device scalar): a non-finite vmap result falls
    back to lax.map for THAT call — if the map result is finite the known
    miscompile is confirmed and remembered for the process; if the map
    result is also non-finite the inputs are bad and we raise instead of
    poisoning the canary."""
    global _VMAP_BATCH8_OK
    if jax.default_backend() != "tpu" or local_batch < 8:
        return run_vmap()

    def all_finite(out: jax.Array) -> bool:
        # device-side reduction: one scalar crosses the host boundary
        return bool(jnp.isfinite(out).all())

    if _VMAP_BATCH8_OK is not False:
        out = run_vmap()
        if all_finite(out):
            if _VMAP_BATCH8_OK is None:
                _VMAP_BATCH8_OK = True
            return out
        out_map = run_map()
        if all_finite(out_map):
            import logging

            _VMAP_BATCH8_OK = False
            logging.getLogger("mav_detection_tpu").warning(
                "TPU vmap batch>=8 RAFT miscompile detected (non-finite "
                "vmap output, finite lax.map output) — using lax.map for "
                "this process; see tools/vmap_miscompile_repro.py")
            return out_map
        raise FloatingPointError(
            "RAFT produced non-finite flow on both vmap and lax.map paths — "
            "this is not the known batch>=8 vmap miscompile; check inputs")
    out = run_map()
    if not all_finite(out):
        raise FloatingPointError(
            "RAFT produced non-finite flow on the lax.map path; check inputs")
    return out


def _refine_scan_module(config: RAFTConfig, iters: int):
    """The ``refine`` nn.scan module exactly as ``RAFT.__call__`` builds it —
    its standalone param tree matches ``params['params']['refine']``, so the
    video path below reuses the shipped checkpoint unchanged."""
    return nn.scan(
        _RefineStep,
        variable_broadcast="params",
        split_rngs={"params": False},
        in_axes=(nn.broadcast, nn.broadcast, nn.broadcast),
        out_axes=0,
        length=iters,
    )(config)


def raft_flow_video(frames: jax.Array, params=None,
                    iters: int = PRODUCT_ITERS,
                    config: RAFTConfig = INFERENCE_CONFIG) -> jax.Array:
    """Flow for every consecutive transition of a video clip, sharing the
    per-frame feature encoding.

    ``frames`` is (n, h, w, 3|1) consecutive frames; returns (n-1, h, w, 2)
    flow for pairs (i, i+1). The pair API (``raft_flow_batch``) encodes each
    interior frame TWICE (it is image2 of one transition and image1 of the
    next — 2(n-1) fnet passes); video is a chain, so this entry encodes each
    unique frame once (n fnet + n-1 cnet passes) and vmaps the GRU refinement
    over transitions against the shared feature stack. Same checkpoint, same
    math as the pair path (the encoders are per-frame pure functions; the
    only numeric difference is bf16 conv batching reassociation, measured
    ~0.02 px); replaces the reference's per-pair FlowNet2 sidecar calls
    (``/root/reference/src/datasets/dataset.py:116-123``) on the product
    video path.

    TPU batch>=8 vmap-miscompile containment: shares ``_contained_batch8``
    with the pair path — every batch>=8 output is finiteness-checked (one
    device scalar) and falls back to ``lax.map`` over transitions when the
    vmapped VIDEO graph (a different composition than the pair graph)
    miscompiles; bad inputs raise instead of poisoning the canary.
    """
    if params is None:
        from mav_detection_tpu.models import pretrained

        params = pretrained.load_raft_params()
        if params is None:
            params = _default_params(
                (frames.shape[1] + (-frames.shape[1]) % 8,
                 frames.shape[2] + (-frames.shape[2]) % 8), config)
    n, h, w = frames.shape[:3]
    if frames.ndim == 3:
        frames = frames[..., None]
    if frames.shape[-1] == 1:
        frames = jnp.repeat(frames, 3, axis=-1)
    ph = (-h) % 8
    pw = (-w) % 8
    if ph or pw:
        frames = jnp.pad(frames, ((0, 0), (0, ph), (0, pw), (0, 0)),
                         mode="edge")

    out = _contained_batch8(
        lambda: _raft_video_apply(params, frames, iters, config, False),
        lambda: _raft_video_apply(params, frames, iters, config, True),
        n - 1)
    return out[:, :h, :w]


@functools.partial(jax.jit,
                   static_argnames=("iters", "config", "use_map"))
def _raft_video_apply(params, frames, iters, config: RAFTConfig,
                      use_map: bool) -> jax.Array:
    cfg = config
    p = params["params"] if "params" in params else params
    xs = frames.astype(jnp.float32) / 127.5 - 1.0

    fnet = Encoder(cfg.feature_dim, dtype=cfg.dtype)
    cnet = Encoder(cfg.hidden_dim + cfg.context_dim, dtype=cfg.dtype)
    feats = jax.vmap(lambda x: fnet.apply({"params": p["fnet"]}, x))(xs)
    couts = jax.vmap(lambda x: cnet.apply({"params": p["cnet"]}, x))(xs[:-1])

    refine = _refine_scan_module(cfg, iters)
    mask_hidden = nn.Conv(128, (3, 3), dtype=cfg.dtype)
    mask_head = nn.Conv(8 * 8 * 9, (1, 1), dtype=jnp.float32)

    def transition(f1, f2, cout):
        hidden = nn.tanh(cout[..., :cfg.hidden_dim])
        context = nn.relu(cout[..., cfg.hidden_dim:])
        if cfg.materialize_corr:
            corr = all_pairs_correlation(f1, f2)
            pyramid = tuple(build_corr_pyramid(corr, cfg.corr_levels))
            vols: tuple = ()
        else:
            pyramid = tuple(build_feature_pyramid(f2, cfg.corr_levels))
            vols = tuple(build_local_corr_volumes(
                f1, pyramid, cfg.corr_radius, cfg.max_flow_lookup))
        flow0 = jnp.zeros(f1.shape[:2] + (2,), jnp.float32)
        (hidden_f, _), (flows8, _) = refine.apply(
            {"params": p["refine"]}, (hidden, flow0), context, pyramid, vols)
        mask = mask_head.apply(
            {"params": p["mask_head"]},
            nn.relu(mask_hidden.apply(
                {"params": p["mask_hidden"]}, hidden_f)).astype(jnp.float32))
        return convex_upsample(flows8[-1], mask)

    if use_map:
        return jax.lax.map(lambda abc: transition(*abc),
                           (feats[:-1], feats[1:], couts))
    return jax.vmap(transition)(feats[:-1], feats[1:], couts)


# ---------------------------------------------------------------- training
def raft_loss(params, model: RAFT, img1, img2, flow_gt, gamma: float = 0.8,
              iters: int = 12, pixel_weight=None):
    """Sequence L1 loss with exponential weighting (RAFT eq. 7).

    ``pixel_weight`` (h, w), if given, reweights the per-pixel L1 — used to
    upweight the intruder-drone mask during training: the drone covers <1% of
    pixels, so an unweighted loss lets the net wash its motion out into the
    background field, which is fatal for the downstream phi-angle detection
    (the whole point of the flow net — reference consumes FlowNet2 for
    exactly this, /root/reference/src/datasets/dataset.py:116-123)."""
    _, preds = model.apply(params, img1, img2, iters)
    n = preds.shape[0]
    weights = gamma ** jnp.arange(n - 1, -1, -1, dtype=jnp.float32)
    err = jnp.abs(preds - flow_gt[None])
    if pixel_weight is not None:
        w = pixel_weight[None, :, :, None]
        per_iter = (jnp.sum(err * w, axis=(1, 2, 3))
                    / (jnp.sum(w) * err.shape[-1]))
    else:
        per_iter = jnp.mean(err, axis=(1, 2, 3))
    return jnp.sum(weights * per_iter)


def make_train_step(model: RAFT, optimizer, iters: int = 12):
    """Returns a jittable (params, opt_state, batch) -> (params, opt_state, loss)
    step; vmapped over the batch internally so it shards over a data mesh."""

    def loss_fn(params, img1, img2, flow_gt):
        per_example = jax.vmap(
            lambda a, b, f: raft_loss(params, model, a, b, f, iters=iters))
        return jnp.mean(per_example(img1, img2, flow_gt))

    @jax.jit
    def train_step(params, opt_state, img1, img2, flow_gt):
        loss, grads = jax.value_and_grad(loss_fn)(params, img1, img2, flow_gt)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        import optax

        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return train_step
