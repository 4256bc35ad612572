"""Per-level iteration-schedule sweep on the bench scene (VERDICT r4 #7).

The chain-restructure probes proved the fused kernel body is at its op-set
optimum (~0.26 ms/iter, PERF.md "Chain restructure"); the remaining
throughput lever is the SCHEDULE — how many solver iterations each pyramid
level runs. The finest level owns ~76% of the cost (level areas scale with
pyr_scale^2), so trading fine iterations for cheap coarse ones can cut
ms/frame if the coarse init is good enough to keep EPE inside the gates
(vs-cv2 < 0.1 px at 752x480; vs-GT < 0.55 px at 1920x1024).

Run serialized on the chip (memory: concurrent TPU jobs produce phantom
timings):
    python tools/iter_schedule_sweep.py [--hires] [--batch 8]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
from dataclasses import replace

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

SCHEDULES = [
    None,             # flat `iterations` (the shipped default, the control)
    (6, 6, 6),        # must time == control (identity check)
    (5, 6, 8),
    (4, 8, 8),
    (4, 8, 12),
    (4, 6, 10),
    (3, 8, 12),
    (5, 5, 5),
    (4, 4, 8),
]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--hires", action="store_true",
                    help="sweep at 1920x1024 instead of 752x480")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (the JAX_PLATFORMS env var "
                         "loses to the axon plugin; PERF.md gotchas)")
    ap.add_argument("--no-timing", action="store_true",
                    help="accuracy-only pre-screen (EPE is backend-exact; "
                         "run on CPU while the chip is busy)")
    ap.add_argument("--schedules", default="",
                    help="semicolon-separated finest-first tuples "
                         "(e.g. '3,4,8;4,4,6') to sweep INSTEAD of the "
                         "built-in list; 'flat' = the control")
    args = ap.parse_args()
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp

    import bench
    from mav_detection_tpu.ops.flow import farneback_flow, tuned_flow_params

    if args.hires:
        h, w = bench.HIRES_HW
        prev8, curr8, gt = bench.make_scene(
            0, h=h, w=w, foe=(w * 0.41, h * 0.4), expansion=0.006,
            drone_pos=(430.0, 260.0), drone_vel=(6.0, 4.0), drone_radius=22.0)
    else:
        h, w = bench.H, bench.W
        prev8, curr8, gt = bench.make_scene(0)
    base = tuned_flow_params(h, w)
    print(f"# {w}x{h} batch={args.batch} base={base.max_shift=}"
          f" {base.band_rows=} flat_iters={base.iterations}")

    try:
        import cv2

        ref = cv2.calcOpticalFlowFarneback(
            prev8, curr8, None, 0.4, 1, 12, 10, 8, 1.2, 0)
    except Exception:
        ref = None

    schedules = SCHEDULES
    if args.schedules:
        schedules = [None if s.strip() == "flat" else
                     tuple(int(v) for v in s.split(","))
                     for s in args.schedules.split(";") if s.strip()]

    for sched in schedules:
        p = replace(base, level_iters=sched)
        ms = (float("nan") if args.no_timing
              else bench.tpu_ms_per_frame(prev8, curr8, args.batch, p))
        ours = np.asarray(farneback_flow(
            jnp.asarray(prev8), jnp.asarray(curr8), p))
        inner = np.s_[16:-16, 16:-16]
        epe_gt = float(np.linalg.norm(ours - gt, axis=-1)[inner].mean())
        epe_cv2 = (float(np.linalg.norm(ours - ref, axis=-1)[inner].mean())
                   if ref is not None else float("nan"))
        print(json.dumps({
            "level_iters": list(sched) if sched else None,
            "ms_per_frame": round(ms, 3),
            "fps_per_chip": round(1e3 / ms, 1),
            "epe_cv2": round(epe_cv2, 4),
            "epe_gt": round(epe_gt, 4)}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
