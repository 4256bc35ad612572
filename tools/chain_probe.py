"""Micro-bench: restructurings of the fused kernel's shift/select chain.

The roofline (PERF.md) puts the fused Farneback kernel at ~37% of the VPU
roof with the two (2S+2)-step one-hot select chains at ~80% of all ops, and
the dynamic_gather probe (tools/gather_probe.py) proved Mosaic's hardware
gather cannot span >1 vreg along the gather dimension — so the lever is the
chain's op structure itself. This probe times the y-stage chain alone, at
the bench config's real block geometry and grid, in four forms:

  A  shipped: wgt = (sy==s)(1-fy) + (sy==s-1)fy; acc_c += wgt*x_s
     (per step: 2 cmp + 2 sel + 1 add shared; 5ch x fma)
  B  mask-reuse: m_s computed once, m_{s-1} carried (saves 1 cmp/step)
  C  dual-gather: acc_f/acc_c select-accumulated with ONE mask per step
     (per step: 1 cmp shared; 5ch x 2 sel), one lerp at the end
  D  C with bf16 slab planes + bf16 selects, f32 final lerp (tests whether
     the VPU runs bf16 selects at 2x)

All variants are checked elementwise against A (C/D differ only in FP
contraction order / precision; tolerance printed). Run serialized on the
chip:  python tools/chain_probe.py [--S 8 --th 24 --tw 752]
"""
from __future__ import annotations

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _slices(slab, S, mrows, acols, o_a, o_f, dtype=None):
    """The 2S+2 statically shifted (mrows, acols) views of one slab plane."""
    out = []
    for s in range(-S, S + 2):
        v = jax.lax.slice(slab, (o_f + s, o_a),
                          (o_f + s + mrows, o_a + acols))
        out.append(v.astype(dtype) if dtype is not None else v)
    return out


def kern(slab_ref, sy_ref, fy_ref, o_ref, *, S, mrows, acols, o_a, o_f,
         variant):
    sy = sy_ref[0]
    fy = fy_ref[0]
    planes = [slab_ref[0, c] for c in range(5)]

    if variant == "A":
        A = [jnp.zeros((mrows, acols), jnp.float32) for _ in range(5)]
        for s in range(-S, S + 2):
            wgt = (jnp.where(sy == s, 1.0 - fy, 0.0)
                   + jnp.where(sy == s - 1, fy, 0.0))
            for c in range(5):
                A[c] = A[c] + wgt * jax.lax.slice(
                    planes[c], (o_f + s, o_a),
                    (o_f + s + mrows, o_a + acols))
    elif variant == "B":
        A = [jnp.zeros((mrows, acols), jnp.float32) for _ in range(5)]
        w0 = 1.0 - fy
        m_prev = jnp.zeros(sy.shape, jnp.bool_)
        for s in range(-S, S + 2):
            m = sy == s
            wgt = jnp.where(m, w0, 0.0) + jnp.where(m_prev, fy, 0.0)
            for c in range(5):
                A[c] = A[c] + wgt * jax.lax.slice(
                    planes[c], (o_f + s, o_a),
                    (o_f + s + mrows, o_a + acols))
            m_prev = m
    elif variant in ("C", "D"):
        dt = jnp.bfloat16 if variant == "D" else jnp.float32
        accf = [jnp.zeros((mrows, acols), dt) for _ in range(5)]
        accc = [jnp.zeros((mrows, acols), dt) for _ in range(5)]
        for s in range(-S, S + 1):
            m = sy == s
            for c in range(5):
                x_s = jax.lax.slice(planes[c], (o_f + s, o_a),
                                    (o_f + s + mrows, o_a + acols))
                x_s1 = jax.lax.slice(planes[c], (o_f + s + 1, o_a),
                                     (o_f + s + 1 + mrows, o_a + acols))
                accf[c] = jnp.where(m, x_s.astype(dt), accf[c])
                accc[c] = jnp.where(m, x_s1.astype(dt), accc[c])
        A = [accf[c].astype(jnp.float32)
             + fy * (accc[c].astype(jnp.float32)
                     - accf[c].astype(jnp.float32)) for c in range(5)]
    else:
        raise ValueError(variant)
    o_ref[0, 0] = sum(A)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--S", type=int, default=8)
    ap.add_argument("--th", type=int, default=24)
    ap.add_argument("--tw", type=int, default=752)
    ap.add_argument("--m", type=int, default=6)
    ap.add_argument("--bands", type=int, default=20)
    ap.add_argument("--reps", type=int, default=300)
    ap.add_argument("--interpret", action="store_true")
    args = ap.parse_args()
    S, th, tw, m = args.S, args.th, args.tw, args.m
    P = S + 1 + m
    mrows, acols = th + 2 * m, tw + 2 * m + 2 * S + 1
    sr, cw = th + 2 * P, tw + 2 * P
    o_f, o_a = P - m, P - m - S
    print(f"backend={jax.default_backend()} S={S} th={th} tw={tw} "
          f"block ({mrows}x{acols}) slab ({sr}x{cw}) grid {args.bands}")

    rng = np.random.default_rng(0)
    slab = jnp.asarray(rng.standard_normal((args.bands, 5, sr, cw)),
                       jnp.float32)
    sy = jnp.asarray(rng.integers(-S, S + 1, (args.bands, mrows, acols)),
                     jnp.float32)
    # pad sy/fy blocks to 8-row alignment like the real kernel's planes
    fy = jnp.asarray(rng.random((args.bands, mrows, acols)), jnp.float32)

    outs, times = {}, {}
    for variant in ("A", "B", "C", "D"):
        f = pl.pallas_call(
            functools.partial(kern, S=S, mrows=mrows, acols=acols,
                              o_a=o_a, o_f=o_f, variant=variant),
            grid=(args.bands,),
            in_specs=[
                pl.BlockSpec((1, 5, sr, cw), lambda i: (i, 0, 0, 0)),
                pl.BlockSpec((1, mrows, acols), lambda i: (i, 0, 0)),
                pl.BlockSpec((1, mrows, acols), lambda i: (i, 0, 0)),
            ],
            out_shape=jax.ShapeDtypeStruct(
                (args.bands, 1, mrows, acols), jnp.float32),
            out_specs=pl.BlockSpec((1, 1, mrows, acols),
                                   lambda i: (i, 0, 0, 0)),
            interpret=args.interpret,
        )
        jf = jax.jit(lambda a, b, c, f=f: f(a, b, c))
        try:
            out = np.asarray(jf(slab, sy, fy))
        except Exception as e:
            print(f"[{variant}] FAILED: {type(e).__name__}: "
                  f"{str(e).splitlines()[0][:160]}")
            continue

        @jax.jit
        def rep(a, b, c, n, jf=jf):
            def body(i, acc):
                return acc + jnp.sum(
                    jf(a + i.astype(jnp.float32) * 1e-6, b, c)
                    [:, :, ::32, ::128])
            return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

        float(rep(slab, sy, fy, 1))
        t0 = time.perf_counter(); float(rep(slab, sy, fy, 1))
        t1 = time.perf_counter() - t0
        t0 = time.perf_counter(); float(rep(slab, sy, fy, args.reps))
        tn = time.perf_counter() - t0
        us = (tn - t1) / (args.reps - 1) * 1e6
        outs[variant], times[variant] = out, us
        extra = ""
        if "A" in outs:
            d = float(np.abs(out - outs["A"]).max())
            extra = f"  max|diff vs A|={d:.2e}"
            if variant in ("A", "B") and d != 0.0:
                extra += "  (EXPECTED EXACT!)"
        base = times.get("A", us)
        print(f"[{variant}] {us:9.1f} us  ({base / us:4.2f}x vs A){extra}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
