"""Spatial (row-sharded) Farneback scaling probe.

Measures farneback_flow_spatial per-frame latency vs the unsharded solver
at a hi-res size across mesh sizes. On a single-chip session this can only
validate execution (mesh of 1); on a real multi-chip slice it produces the
scaling curve for PERF.md ("Spatial Farneback").

Usage:  python tools/spatial_probe.py [H W]
        (H must divide by every probed mesh size)
"""
from __future__ import annotations

import sys
import time

import numpy as np


def amortized_ms(fn, min_window_s: float = 0.5) -> float:
    float(fn(1))
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

    from mav_detection_tpu.ops.flow import FarnebackParams
    from mav_detection_tpu.ops.flow.farneback import farneback_flow
    from mav_detection_tpu.parallel import farneback_flow_spatial, make_mesh

    H, W = (1024, 1920) if len(sys.argv) < 3 else (int(sys.argv[1]),
                                                   int(sys.argv[2]))
    params = FarnebackParams(warp="separable", levels=2, pyr_scale=0.5,
                             iterations=6, max_shift=8)
    rng = np.random.default_rng(0)
    prev = jnp.asarray(rng.random((H, W)) * 255, jnp.float32)
    curr = jnp.asarray(rng.random((H, W)) * 255, jnp.float32)

    def rep_unsharded(n):
        @jax.jit
        def f(n, a, b):
            def body(i, acc):
                fl = farneback_flow(a + i.astype(jnp.float32) * 1e-6, b,
                                    params)
                return acc + jnp.sum(fl[::97, ::97, 0])
            return jax.lax.fori_loop(0, n, body, 0.0)

        return f(n, prev, curr)

    print(f"unsharded {H}x{W}: {amortized_ms(rep_unsharded):.2f} ms/frame")

    n_avail = len(jax.devices())
    for p in (2, 4, 8):
        if p > n_avail or H % p:
            continue
        mesh = make_mesh(p)

        def rep_spatial(n, mesh=mesh):
            @jax.jit
            def f(n, a, b):
                def body(i, acc):
                    fl = farneback_flow_spatial(
                        a + i.astype(jnp.float32) * 1e-6, b, params, mesh)
                    return acc + jnp.sum(fl[::97, ::97, 0])
                return jax.lax.fori_loop(0, n, body, 0.0)

            return f(n, prev, curr)

        print(f"spatial P={p}: {amortized_ms(rep_spatial):.2f} ms/frame")


if __name__ == "__main__":
    main()
