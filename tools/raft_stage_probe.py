"""Per-stage RAFT inference timings on real hardware.

Splits the shipped inference graph (INFERENCE_CONFIG, final-only upsample,
PRODUCT_ITERS) into its three cost centers and times each with the amortized
in-program-repetition method (PERF.md "Harness gotchas": the tunnel's
``block_until_ready`` does not block):

  full iters=1/6   — whole forward; the slope is the per-GRU-iteration cost
  encoder          — the two fnet passes (feature extraction)
  corr volumes     — ``build_local_corr_volumes`` (the banded per-frame
                     precompute; PERF.md "RAFT volume matmul")
  batch-8          — vmap and lax.map ms/frame on the product batch path

Run on the chip:  python tools/raft_stage_probe.py [H W]
"""
from __future__ import annotations

import sys
import time

import numpy as np


def amortized_ms(fn, min_window_s: float = 0.5) -> float:
    """t(N) - t(1) amortized ms per rep (fn(n) -> scalar)."""
    float(fn(1))  # compile + warm
    n_hi = 8
    while True:
        t0 = time.perf_counter()
        float(fn(1))
        t1 = time.perf_counter() - t0
        t0 = time.perf_counter()
        float(fn(n_hi))
        t2 = time.perf_counter() - t0
        if t2 - t1 > min_window_s or n_hi >= 4096:
            return (t2 - t1) / (n_hi - 1) * 1e3
        n_hi *= 4


def main() -> None:
    import jax
    import jax.numpy as jnp

    from mav_detection_tpu.models import raft as R
    from mav_detection_tpu.models import pretrained

    H, W = (480, 752) if len(sys.argv) < 3 else (int(sys.argv[1]),
                                                 int(sys.argv[2]))
    cfg = R.INFERENCE_CONFIG
    params = pretrained.load_raft_params()
    if params is None:
        _, params = R.create_raft(image_hw=(H + (-H) % 8, W + (-W) % 8))
    rng = np.random.default_rng(0)
    img1 = jnp.asarray(rng.integers(0, 255, (H, W, 3)), jnp.uint8)
    img2 = jnp.asarray(rng.integers(0, 255, (H, W, 3)), jnp.uint8)

    def rep_full(iters):
        @jax.jit
        def f(n, a, b):
            def body(i, acc):
                flow = R.raft_flow(params, a + (i % 2).astype(jnp.uint8),
                                   b, iters=iters)
                return acc + flow[0, 0, 0]
            return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))
        return lambda n: f(n, img1, img2)

    ms1 = amortized_ms(rep_full(1))
    ms6 = amortized_ms(rep_full(R.PRODUCT_ITERS))
    slope = (ms6 - ms1) / (R.PRODUCT_ITERS - 1)
    print(f"full iters=1: {ms1:.2f} ms")
    print(f"full iters={R.PRODUCT_ITERS}: {ms6:.2f} ms   "
          f"slope {slope:.3f} ms/iter")

    # ---- encoder (two fnet passes, as in the forward)
    fnet_params = {"params": params["params"]["fnet"]}
    x1 = img1.astype(jnp.float32) / 127.5 - 1.0
    x2 = img2.astype(jnp.float32) / 127.5 - 1.0

    @jax.jit
    def rep_enc(n, x1, x2):
        enc = R.Encoder(cfg.feature_dim, dtype=cfg.dtype)

        def body(i, acc):
            f1 = enc.apply(fnet_params, x1 + (i % 2).astype(jnp.float32))
            f2 = enc.apply(fnet_params, x2)
            return acc + f1[0, 0, 0] + f2[0, 0, 0]
        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    print(f"encoder (fnet x2): {amortized_ms(lambda n: rep_enc(n, x1, x2)):.2f} ms")

    # ---- corr volumes (per-frame precompute on encoder features)
    enc = R.Encoder(cfg.feature_dim, dtype=cfg.dtype)
    f1 = enc.apply(fnet_params, x1)
    f2 = enc.apply(fnet_params, x2)
    pyr = tuple(R.build_feature_pyramid(f2, cfg.corr_levels))

    @jax.jit
    def rep_vols(n, f1, pyr):
        def body(i, acc):
            vols = R.build_local_corr_volumes(
                f1 + (i % 2).astype(jnp.float32) * 1e-6, pyr,
                cfg.corr_radius, cfg.max_flow_lookup)
            return acc + vols[0][0, 0, 0, 0]
        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    print(f"local corr volumes: {amortized_ms(lambda n: rep_vols(n, f1, pyr)):.2f} ms")

    # ---- batch-8 product paths
    b1 = jnp.asarray(rng.integers(0, 255, (8, H, W, 3)), jnp.uint8)
    b2 = jnp.asarray(rng.integers(0, 255, (8, H, W, 3)), jnp.uint8)

    for name, mapper in (("vmap", jax.vmap),
                         ("lax.map", None)):
        @jax.jit
        def f(n, a, b, _mapper=mapper):
            def one(u, v):
                return R.raft_flow(params, u, v, iters=R.PRODUCT_ITERS)

            def body(i, acc):
                ap = a + (i % 2).astype(jnp.uint8)
                if _mapper is jax.vmap:
                    out = jax.vmap(one)(ap, b)
                else:
                    out = jax.lax.map(lambda uv: one(uv[0], uv[1]), (ap, b))
                return acc + out[0, 0, 0, 0]
            return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

        ms = amortized_ms(lambda n: f(n, b1, b2)) / 8.0
        flow = R.raft_flow_batch(b1, b2, params=params)
        finite = bool(jnp.isfinite(flow).all())
        print(f"batch8 {name}: {ms:.2f} ms/frame ({1e3 / ms:.1f} fps/chip), "
              f"finite={finite}")


if __name__ == "__main__":
    main()
