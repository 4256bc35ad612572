"""Per-stage batch-scaling probe for the full Farneback flow pipeline.

The fused Pallas iterate kernel is batch-neutral (tools/batch_overhead_probe:
0.291 -> 0.296 ms/frame/iter at b=1 -> 8), so the ~8% end-to-end batch-8
deficit (BENCH: 329 vs 356 fps) must live in the XLA stages around it:
Gaussian smooth, pyramid resizes, poly_exp, the hwb<->channel-first
transposes, and inter-level flow rescale. This probe times, at batch 1 and 8:

  pipeline   — farneback_flow_batch end-to-end (product params)
  iter@L0    — the Pallas iterate alone at full resolution
  iter@L1    — the Pallas iterate alone at the coarse level
  preproc    — smooth + resize + poly_exp for both levels + transposes
               (the pipeline minus the iterate calls), measured directly

Run on the chip:  PYTHONPATH=/root/repo python tools/pipeline_stage_probe.py
"""
from __future__ import annotations

import time

import numpy as np


def amortized_ms(fn, min_window_s: float = 0.5) -> float:
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

    from mav_detection_tpu.ops.flow import farneback as fb
    from mav_detection_tpu.ops.flow import farneback_pallas as fp
    from mav_detection_tpu.ops.flow.farneback import FarnebackParams

    H, W = 480, 752
    # the bench/product tuned config (bench.py:_params)
    params = FarnebackParams(levels=2, pyr_scale=0.5, warp="pallas",
                             iterations=6, max_shift=8, band_rows=24)
    rng = np.random.default_rng(0)
    print(f"params: levels={params.levels} iters={params.iterations} "
          f"S={params.max_shift} band_rows={params.band_rows}")

    for b in (1, 8):
        prev = jnp.asarray(rng.random((b, H, W)) * 255, jnp.float32)
        curr = jnp.asarray(rng.random((b, H, W)) * 255, jnp.float32)

        @jax.jit
        def pipeline(n, prev, curr):
            def body(i, acc):
                f = fb.farneback_flow_batch(
                    prev + (i % 2).astype(jnp.float32), curr, params)
                return acc + f[0, 0, 0, 0]
            return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

        ms_pipe = amortized_ms(lambda n: pipeline(n, prev, curr)) / b

        # iterate alone at each pyramid layer shape (cv2 semantics:
        # ``levels`` extra coarse layers, levels+1 total)
        layers = [("L%d" % k, (int(round(H * params.pyr_scale ** k)),
                               int(round(W * params.pyr_scale ** k))))
                  for k in range(params.levels + 1)]
        iter_ms = {}
        for tag, (h, w) in layers:
            R0 = jnp.asarray(rng.random((b, 5, h, w)), jnp.float32)
            R1 = jnp.asarray(rng.random((b, 5, h, w)), jnp.float32)
            fl = jnp.asarray(rng.random((b, 2, h, w)), jnp.float32)
            bor = jnp.ones((h, w), jnp.float32)

            @jax.jit
            def it(n, R0, R1, fl, bor):
                def body(i, acc):
                    out = fp.farneback_iterate_pallas(
                        R0, R1, fl + (i % 2).astype(jnp.float32) * 1e-6, bor,
                        iterations=params.iterations, winsize=params.winsize,
                        max_shift=params.max_shift,
                        band_rows=params.band_rows)
                    return acc + out[0, 0, 0, 0]
                return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

            iter_ms[tag] = amortized_ms(
                lambda n, R0=R0, R1=R1, fl=fl, bor=bor: it(n, R0, R1, fl, bor)
            ) / b

        resid = ms_pipe - sum(iter_ms.values())
        parts = " | ".join(f"iter@{t} {v:.3f}" for t, v in iter_ms.items())
        print(f"b={b}: pipeline {ms_pipe:.3f} ms/frame | {parts} | "
              f"residual (XLA preproc) {resid:.3f}")


if __name__ == "__main__":
    main()
