"""Localize the Pallas solver's batch-8 per-iteration overhead (PERF.md
"Pallas kernel tuning": 0.62 ms/frame/iter at b=1 vs 0.675 at b=8 — the
source of the ~8% end-to-end batch deficit vs single-stream in BENCH_r03).

Splits one solver iteration into its two movable parts and times each at
batch 1 and 8 with the amortized in-program-repetition method (the tunnel's
``block_until_ready`` does not block — see PERF.md "Harness gotchas"):

  restack   — the XLA-level ``_stack_tiles(flow, ...)`` halo re-banding that
              runs between kernel calls every iteration
  kernel    — ``pl.pallas_call`` on loop-invariant pre-stacked inputs
  full      — the shipped restack+kernel iteration loop

If ``restack`` carries the batch scaling, the fix is overlapping-window
flow reads inside the kernel (``pl.Element`` block dims — supported by this
JAX's pallas core; Mosaic lowering support must be confirmed on hardware)
or folding the restack into the previous iteration's output spec. If
``kernel`` carries it, try the grid-order variant (batch innermost so the
band slab stays resident across batch steps).

Run on the chip:  python tools/batch_overhead_probe.py [H W]
"""
from __future__ import annotations

import sys
import time

import numpy as np


def amortized_ms(fn, n_lo: int = 1, min_window_s: float = 0.5) -> float:
    """t(N) - t(1) amortized ms per unit of work (fn(n) -> scalar)."""
    float(fn(n_lo))  # compile + warm
    n_hi = 8
    while True:
        t0 = time.perf_counter()
        float(fn(n_lo))
        t1 = time.perf_counter() - t0
        t0 = time.perf_counter()
        float(fn(n_hi))
        t2 = time.perf_counter() - t0
        if t2 - t1 > min_window_s or n_hi >= 4096:
            return (t2 - t1) / (n_hi - n_lo) * 1e3
        n_hi *= 4


def main() -> None:
    import jax
    import jax.numpy as jnp

    from mav_detection_tpu.ops.flow import farneback_pallas as fp

    H, W = (480, 752) if len(sys.argv) < 3 else (int(sys.argv[1]),
                                                 int(sys.argv[2]))
    S, win, th = 8, 12, 24
    m = win // 2
    P = S + 1 + m
    rng = np.random.default_rng(0)

    for b in (1, 8):
        R0 = jnp.asarray(rng.random((b, 5, H, W)), jnp.float32)
        R1 = jnp.asarray(rng.random((b, 5, H, W)), jnp.float32)
        flow = jnp.asarray(rng.random((b, 2, H, W)), jnp.float32)
        border = jnp.ones((H, W), jnp.float32)

        # --- full shipped iteration loop: repeat a FIXED-iteration solve n
        # times inside one jit (iterations is a static arg — varying it with
        # n would recompile per rep and time the compiler, not the chip)
        ITERS = 6

        def make_full(halo):
            @jax.jit
            def rep(n, R0, R1, flow, border):
                def body(i, acc):
                    out = fp.farneback_iterate_pallas(
                        R0, R1, flow + (i % 2).astype(jnp.float32) * 1e-6,
                        border, iterations=ITERS, winsize=win, max_shift=S,
                        band_rows=th, halo=halo)
                    return acc + out[0, 0, 0, 0]
                return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))
            return lambda n: rep(n, R0, R1, flow, border)

        full = make_full("stacked")
        full_element = make_full("element")

        # fori-based variants need static tile geometry mirroring the entry
        nbands = -(-H // th)
        tw = W  # same auto choice as the entry for W <= 1024
        slab = fp._stack_tiles(R1, th, tw, P, P)
        r0b = fp._stack_tiles(R0, th, tw, P, P)
        borb = fp._stack_tiles(border, th, tw, P, P)

        import functools

        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        kern = functools.partial(
            fp._fused_iter_kernel, th=th, tw=tw, H=H, W=W, S=S, m=m,
            inv_win2=1.0 / (win * win))
        bandspec5 = pl.BlockSpec(
            (1, 5, 1, 1, th + 2 * P, tw + 2 * P),
            lambda i, j, t: (i, 0, j, t, 0, 0), memory_space=pltpu.VMEM)
        borspec = pl.BlockSpec(
            (1, 1, th + 2 * P, tw + 2 * P),
            lambda i, j, t: (j, t, 0, 0), memory_space=pltpu.VMEM)
        flowspec = pl.BlockSpec(
            (1, 2, 1, 1, th + 2 * m, tw + 2 * P),
            lambda i, j, t: (i, 0, j, t, 0, 0), memory_space=pltpu.VMEM)
        outspec = pl.BlockSpec(
            (1, 2, th, tw), lambda i, j, t: (i, 0, j, t),
            memory_space=pltpu.VMEM)
        Hp = nbands * th
        call = pl.pallas_call(
            kern, out_shape=jax.ShapeDtypeStruct((b, 2, Hp, W), jnp.float32),
            grid=(b, nbands, 1),
            in_specs=[flowspec, bandspec5, bandspec5, borspec],
            out_specs=outspec)

        flowb0 = fp._stack_tiles(flow, th, tw, m, P)

        # NOTE: the stacked slabs must be jit ARGUMENTS, not closures —
        # closed-over device arrays bake into the HLO as constants and the
        # tunnel's remote_compile rejects multi-MB request bodies (HTTP 413).
        @jax.jit
        def kernel_only(n, flowb0, slab, r0b, borb):
            def body(i, acc):
                # perturb to defeat CSE; input stays pre-stacked
                out = call(flowb0 + (i % 2).astype(jnp.float32) * 1e-6,
                           slab, r0b, borb)
                return acc + out[0, 0, 0, 0]
            return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

        @jax.jit
        def restack_only(n, flow):
            def body(i, acc):
                fb = fp._stack_tiles(flow + (i % 2).astype(jnp.float32) * 1e-6,
                                     th, tw, m, P)
                return acc + fb[0, 0, 0, 0, 0, 0]
            return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

        ms_full = amortized_ms(full) / (b * ITERS)
        ms_kernel = amortized_ms(
            lambda n: kernel_only(n, flowb0, slab, r0b, borb)) / b
        ms_restack = amortized_ms(lambda n: restack_only(n, flow)) / b
        try:
            ms_elem = f"{amortized_ms(full_element) / (b * ITERS):.3f}"
        except Exception as e:  # Mosaic may reject Element dims
            ms_elem = f"unsupported ({type(e).__name__}: {str(e)[:300]})"
        print(f"b={b}: full {ms_full:.3f} ms/frame/iter | kernel-only "
              f"{ms_kernel:.3f} | restack-only {ms_restack:.3f} | "
              f"element-halo {ms_elem}")


if __name__ == "__main__":
    main()
