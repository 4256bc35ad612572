"""Minimal reproducer for the TPU vmap-batch>=8 RAFT NaN miscompile.

Round-2 finding (PERF.md "RAFT inference"): on the then-current TPU
toolchain, the composed banded-volume correlation-lookup graph inside
``models.raft`` compiles to all-NaN output under ``jax.vmap`` at batch >= 8,
while batch 1/2/4 are bit-correct and every stage is clean in isolation.
``raft_flow_batch`` contains this with a run-time canary (vmap output
finiteness) + ``lax.map`` fallback.

This script is the standalone probe: it runs the REAL inference graph (the
shipped checkpoint if present, random weights otherwise) at batches 1..16
under both vmap and lax.map on whatever backend JAX selects, and reports
finiteness and max |vmap - map| divergence per batch. Run it after toolchain
updates; when every row prints OK the workaround auto-disables (the canary in
``raft_flow_batch`` makes the same check at run time).

Usage: python tools/vmap_miscompile_repro.py [--hw 240x320] [--iters 6]
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--hw", default="240x320",
                    help="frame size HxW (the bug reproduced at 480x752 and "
                    "240x320 alike in round 2)")
    ap.add_argument("--iters", type=int, default=6)
    ap.add_argument("--batches", default="4,8,16")
    args = ap.parse_args()
    h, w = (int(x) for x in args.hw.split("x"))

    from mav_detection_tpu.models import pretrained
    from mav_detection_tpu.models.raft import create_raft, raft_flow

    params = pretrained.load_raft_params()
    if params is None:
        print("no checkpoint; using random weights (bug is weight-independent)")
        _, params = create_raft(image_hw=(h + (-h) % 8, w + (-w) % 8))

    rng = np.random.default_rng(0)
    print(f"backend={jax.default_backend()} frame={h}x{w} iters={args.iters}")
    any_bad = False
    for batch in (int(b) for b in args.batches.split(",")):
        a = jnp.asarray(rng.random((batch, h, w, 3), np.float32) * 255)
        b = jnp.asarray(np.roll(np.asarray(a), 2, axis=2))
        fv = np.asarray(jax.vmap(
            lambda x, y: raft_flow(params, x, y, args.iters))(a, b))
        fm = np.asarray(jax.lax.map(
            lambda xy: raft_flow(params, xy[0], xy[1], args.iters), (a, b)))
        v_ok = np.isfinite(fv).all()
        m_ok = np.isfinite(fm).all()
        div = float(np.abs(fv - fm).max()) if (v_ok and m_ok) else float("nan")
        status = "OK" if (v_ok and m_ok and div < 1e-3) else "MISCOMPILE"
        any_bad |= status != "OK"
        print(f"batch={batch:3d}: vmap finite={v_ok} map finite={m_ok} "
              f"max|vmap-map|={div:.2e}  {status}")
    print("RESULT:", "MISCOMPILE PRESENT — lax.map workaround stays active"
          if any_bad else "toolchain clean — canary will select vmap")
    return 1 if any_bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
