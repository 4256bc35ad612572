"""Lucas-Kanade at the reference's native 1920x1024 (VERDICT r4 #5).

The reference's sparse path fed LK tracks to the FoE at full AirSim
resolution (``/root/reference/src/lucas_kanade.py:22-29`` on 1920x1024
inputs); every prior LK measurement here stopped at the bench family
(0.158 px dense EPE after densification, PERF.md "Cross-domain"). This
probe measures BOTH products at hires on the bench scene:

* sparse tracks (what the FoE consumes): EPE of tracked displacement vs the
  analytic GT flow at each surviving Shi-Tomasi corner;
* the densified field (``--flow-source LUCAS_KANADE``): interior dense EPE
  vs GT, plus amortized device ms/frame at batch 1 and 8.

Run serialized on the chip:
    python tools/hires_lk_probe.py [--batches 1,8] [--corners 2000]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", default="1,8")
    ap.add_argument("--corners", type=int, default=2000,
                    help="Shi-Tomasi budget (reference maxCorners=2000)")
    ap.add_argument("--size", default="1024x1920", metavar="HxW")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (the JAX_PLATFORMS env var "
                         "loses to the axon plugin; PERF.md gotchas)")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import bench
    from mav_detection_tpu.ops.flow.lucas_kanade import (
        lk_dense_flow,
        lucas_kanade_track,
        shi_tomasi_corners,
    )

    h, w = (int(v) for v in args.size.split("x"))
    prev8, curr8, gt = bench.make_scene(0, h=h, w=w, foe=(w * 0.41, h * 0.4),
                                        expansion=0.006,
                                        drone_pos=(430.0, 260.0),
                                        drone_vel=(6.0, 4.0),
                                        drone_radius=22.0)
    print(f"backend={jax.default_backend()} {w}x{h} "
          f"max |gt| {np.abs(gt).max():.1f} px corners={args.corners}")
    g0 = jnp.asarray(prev8, jnp.float32)
    g1 = jnp.asarray(curr8, jnp.float32)

    # --- sparse tracks (the FoE's diet)
    corners = shi_tomasi_corners(g0, max_corners=args.corners,
                                 quality_level=0.05)
    tracked = lucas_kanade_track(g0, g1, corners.points)
    ok = np.asarray(corners.valid & tracked.status)
    pts = np.asarray(corners.points)[ok]
    disp = np.asarray(tracked.points - corners.points)[ok]
    gt_at = gt[np.clip(pts[:, 1].astype(int), 0, h - 1),
               np.clip(pts[:, 0].astype(int), 0, w - 1)]
    track_epe = np.linalg.norm(disp - gt_at, axis=-1)
    print(json.dumps({
        "tracks": int(ok.sum()),
        "track_epe_mean": round(float(track_epe.mean()), 4),
        "track_epe_p90": round(float(np.quantile(track_epe, 0.9)), 4)}))

    # --- densified field accuracy
    dense = np.asarray(lk_dense_flow(g0, g1, max_corners=args.corners))
    inner = np.s_[16:-16, 16:-16]
    epe_dense = float(np.linalg.norm(dense - gt, axis=-1)[inner].mean())
    print(json.dumps({"dense_epe_gt": round(epe_dense, 4)}))

    # --- throughput (amortized in-program reps; PERF.md "Harness gotchas")
    # --batches "" skips timing (accuracy-only runs on CPU)
    for b in (int(x) for x in args.batches.split(",") if x.strip()):
        pb = jnp.tile(g0[None], (b, 1, 1))
        cb = jnp.tile(g1[None], (b, 1, 1))

        @jax.jit
        def rep(pb, cb, n):
            def body(i, acc):
                f = jax.vmap(lambda a, c: lk_dense_flow(
                    a, c, max_corners=args.corners))(
                        pb + i.astype(jnp.float32) * 1e-3, cb)
                return acc + jnp.float32(jnp.sum(f[:, ::128, ::128]))
            return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

        try:
            float(rep(pb, cb, 1))
        except Exception as e:
            print(json.dumps({"batch": b, "error": type(e).__name__}))
            print(f"  {e}")
            continue
        n = max(17 // b, 3)
        while True:
            t0 = time.perf_counter(); float(rep(pb, cb, 1))
            t1 = time.perf_counter() - t0
            t0 = time.perf_counter(); float(rep(pb, cb, n))
            tn = time.perf_counter() - t0
            if tn - t1 > 0.5 or n >= 4096:
                break
            n *= 4
        ms = (tn - t1) / ((n - 1) * b) * 1e3
        print(json.dumps({"batch": b, "ms_per_frame": round(ms, 2),
                          "fps_per_chip": round(1e3 / ms, 1)}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
