"""Hardware parity check: element-halo vs stacked Pallas layouts at 1920x1024.

VERDICT r3 #3 closure evidence. The element-halo layout used to silently
degrade to stacked for any frame wider than one column tile — exactly the
reference's native 1920x1024 AirSim frames (``etc/settings.json:17-19``)
where the per-iteration HBM flow restack hurts most. With 128-aligned
auto-tiles the Element column starts are statically lane-aligned and Mosaic
accepts the multi-tile layout; ``tests/test_farneback_pallas.py::
test_element_halo_multi_column_tile`` pins the interpret-mode semantics and
THIS tool proves the real-TPU lowering: both layouts must be BIT-EXACT on
the chip at the full reference resolution, and their amortized timings are
reported (the sweep in tools/hires_flow_sweep.py picks the product config).

Run on the chip: python tools/wide_frame_check.py [--hw 1024x1920]
Exit 0 = bit-exact on hardware; 1 = divergence or lowering failure.

Hardware result (2026-08-19, v5e, 1920x1024 batch=2 S=16 band_rows=24):
bit-exact=True max|diff|=0.00e+00; element 16.38 vs stacked 17.47 ms/frame
(ratio 0.938) — the multi-column-tile element lowering is proven on chip.
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


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--hw", default="1024x1920")
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--iterations", type=int, default=6)
    ap.add_argument("--band-rows", type=int, default=24)
    ap.add_argument("--max-shift", type=int, default=16)
    args = ap.parse_args()
    H, W = (int(x) for x in args.hw.split("x"))

    from mav_detection_tpu.ops.flow.farneback import (
        _border_scale_map,
        _poly_exp,
    )
    from mav_detection_tpu.ops.flow.farneback_pallas import (
        farneback_iterate_pallas,
    )

    print(f"backend={jax.default_backend()} frame {W}x{H} "
          f"batch={args.batch} shift={args.max_shift} "
          f"band_rows={args.band_rows}")

    rng = np.random.default_rng(0)
    import cv2

    base = cv2.GaussianBlur(rng.random((H, W)).astype(np.float32),
                            (0, 0), 1.8) * 255
    M = np.float32([[1, 0, 2.4], [0, 1, -1.3]])
    curr = cv2.warpAffine(base, M, (W, H))
    p = jnp.asarray(base)[..., None]
    c = jnp.asarray(curr)[..., None]
    R0 = jnp.transpose(_poly_exp(p, 8, 1.2), (2, 3, 0, 1))
    R1 = jnp.transpose(_poly_exp(c, 8, 1.2), (2, 3, 0, 1))
    R0b = jnp.tile(R0, (args.batch, 1, 1, 1))
    R1b = jnp.tile(R1, (args.batch, 1, 1, 1))
    border = _border_scale_map(H, W)
    f0 = jnp.zeros((args.batch, 2, H, W), jnp.float32)

    outs, times = {}, {}
    for halo in ("element", "stacked"):
        it = jax.jit(functools.partial(
            farneback_iterate_pallas, iterations=args.iterations,
            winsize=12, max_shift=args.max_shift,
            band_rows=args.band_rows, halo=halo))
        try:
            out = np.asarray(it(R0b, R1b, f0, border))
        except Exception as e:
            print(f"[{halo}] LOWERING FAILED: {type(e).__name__}: {e}")
            return 1
        # amortized timing (axon tunnel: single dispatches are bogus)
        @jax.jit
        def rep(r0, r1, f, n, it=it):
            def body(i, acc):
                o = it(r0 + i.astype(jnp.float32) * 1e-6, r1, f, border)
                return acc + jnp.float32(jnp.sum(o[:, :, ::128, ::128]))
            return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

        float(rep(R0b, R1b, f0, 1))
        n = 8
        t0 = time.perf_counter(); float(rep(R0b, R1b, f0, 1))
        t1 = time.perf_counter() - t0
        t0 = time.perf_counter(); float(rep(R0b, R1b, f0, n))
        tn = time.perf_counter() - t0
        ms = (tn - t1) / ((n - 1) * args.batch) * 1e3
        outs[halo], times[halo] = out, ms
        print(f"[{halo}] {ms:.2f} ms/frame ({args.iterations} iters), "
              f"|flow| p50={np.median(np.abs(out)):.3f}")

    exact = bool((outs["element"] == outs["stacked"]).all())
    maxdiff = float(np.abs(outs["element"] - outs["stacked"]).max())
    print(f"bit-exact={exact} max|diff|={maxdiff:.2e}  "
          f"element/stacked time ratio "
          f"{times['element'] / times['stacked']:.3f}")
    return 0 if exact else 1


if __name__ == "__main__":
    sys.exit(main())
