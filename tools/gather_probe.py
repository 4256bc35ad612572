"""Probe: does tpu.dynamic_gather beat the (2S+2)-step select chain?

The fused Farneback kernel realizes the per-element shifted read
``A[j,a] = slab[j + sy[j,a], a]`` as a (2S+2)-step accumulate of one-hot
selects — the dominant VPU cost (~80% of kernel ops, see PERF.md
"Roofline"). Mosaic lowers ``jnp.take_along_axis(x, idx, axis=0|1)`` on
2-D f32 arrays to ``tpu.dynamic_gather`` (jax 0.9
``pallas/mosaic/lowering.py:2464-2524``), which — if it is a real
hardware shuffle and not an unrolled select ladder — replaces the whole
chain with 2 gathers per plane (floor + ceil rows for the fractional
interpolation).

This probe times, inside otherwise identical Pallas kernels on one
(rows x cols) f32 plane:
  a. the shipped-style chain: (2S+2) steps of compare/select/fma
  b. take_along_axis(axis=0) x2 + lerp (sublane gather)
  c. take_along_axis(axis=1) x2 + lerp (lane gather)
and checks b against a for exactness. Run serialized on the chip:
    python tools/gather_probe.py [--rows 64 --cols 768 --S 8]
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


def chain_kernel(x_ref, sy_ref, fy_ref, o_ref, *, S: int, rows: int,
                 cols: int, axis: int):
    """(2S+2)-step one-hot select chain, the shipped kernel's form.
    ``sy``/``fy`` come padded to x's shape; only the leading (rows, cols)
    window is meaningful."""
    sy = jax.lax.slice(sy_ref[...], (0, 0), (rows, cols))
    fy = jax.lax.slice(fy_ref[...], (0, 0), (rows, cols))
    acc = jnp.zeros((rows, cols), jnp.float32)
    for s in range(-S, S + 2):
        wgt = (jnp.where(sy == s, 1.0 - fy, 0.0)
               + jnp.where(sy == s - 1, fy, 0.0))
        start = (S + s, 0) if axis == 0 else (0, S + s)
        acc = acc + wgt * jax.lax.slice(
            x_ref[...], start, (start[0] + rows, start[1] + cols))
    o_ref[...] = acc


def gather_kernel(x_ref, sy_ref, fy_ref, o_ref, *, S: int, rows: int,
                  cols: int, axis: int):
    """Two dynamic gathers + lerp; indices at x's full (padded) shape."""
    sy = sy_ref[...]
    fy = fy_ref[...]
    x = x_ref[...]
    n = x.shape[axis]
    base = jax.lax.broadcasted_iota(jnp.int32, x.shape, axis)
    idx0 = jnp.clip(base + sy.astype(jnp.int32) + S, 0, n - 1)
    idx1 = jnp.clip(idx0 + 1, 0, n - 1)
    g0 = jnp.take_along_axis(x, idx0, axis=axis)
    g1 = jnp.take_along_axis(x, idx1, axis=axis)
    out = (1.0 - fy) * g0 + fy * g1
    o_ref[...] = jax.lax.slice(out, (0, 0), (rows, cols))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=64)
    ap.add_argument("--cols", type=int, default=768)
    ap.add_argument("--S", type=int, default=8)
    ap.add_argument("--reps", type=int, default=200)
    ap.add_argument("--interpret", action="store_true")
    args = ap.parse_args()
    rows, cols, S = args.rows, args.cols, args.S
    print(f"backend={jax.default_backend()} plane {rows}x{cols} S={S}")

    rng = np.random.default_rng(0)

    def inputs(axis):
        shape = ((rows + 2 * S + 1, cols) if axis == 0
                 else (rows, cols + 2 * S + 1))
        x = jnp.asarray(rng.standard_normal(shape), jnp.float32)
        sy = jnp.asarray(rng.integers(-S, S + 1, shape), jnp.float32)
        fy = jnp.asarray(rng.random(shape), jnp.float32)
        return x, sy, fy

    def run(kern, inp, axis):
        f = pl.pallas_call(
            functools.partial(kern, S=S, rows=rows, cols=cols, axis=axis),
            out_shape=jax.ShapeDtypeStruct((rows, cols), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            interpret=args.interpret,
        )
        jf = jax.jit(f)
        out = np.asarray(jf(*inp))

        @jax.jit
        def rep(a, b, c, n):
            def body(i, acc):
                return acc + jnp.sum(jf(a + i * 1e-6, b, c)[::32, ::128])
            return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

        float(rep(*inp, 1))
        t0 = time.perf_counter(); float(rep(*inp, 1))
        t1 = time.perf_counter() - t0
        t0 = time.perf_counter(); float(rep(*inp, args.reps))
        tn = time.perf_counter() - t0
        return out, (tn - t1) / (args.reps - 1) * 1e6  # us per call

    for axis in (0, 1):
        inp = inputs(axis)
        try:
            out_a, us_a = run(chain_kernel, inp, axis)
            print(f"[chain  axis={axis}] {us_a:8.1f} us")
        except Exception as e:
            print(f"[chain  axis={axis}] FAILED: {type(e).__name__}: {e}")
            continue
        try:
            out_g, us_g = run(gather_kernel, inp, axis)
            exact = bool((out_g == out_a).all())
            print(f"[gather axis={axis}] {us_g:8.1f} us "
                  f"({us_a / us_g:.2f}x vs chain) exact_vs_chain={exact}")
        except Exception as e:
            print(f"[gather axis={axis}] FAILED: {type(e).__name__}: {e}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
