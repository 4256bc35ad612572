"""RAFT flow throughput at the AirSim reference resolution (1920x1024).

VERDICT r3 #1 wants amortized fps/chip for BOTH flow paths at the
reference's native camera resolution (``/root/reference/etc/settings.json:
17-19``): the Farneback flow+detect number lives in bench.py's ``hires``
fields / tools/hires_flow_sweep.py; this probe measures the RAFT net.

Notes at this scale:
* The feature grid is 128x240 (30,720 positions). The banded local-corr
  volumes stay exact for |flow| <= 16 px (the product default) — the bench
  scene's ~12 px motion fits, so no escalation fires.
* Batches beyond 2 approach the HBM working-set knee for the unrolled GRU
  graph; the probe sweeps what fits.

Timing uses the amortized in-program repetition method (PERF.md "Harness
gotchas").

Run on the chip: python tools/hires_raft_probe.py [--batches 1,2,4]
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

HIRES_HW = (1024, 1920)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", default="1,2,4")
    ap.add_argument("--iters", type=int, default=0, help="0 = product default")
    ap.add_argument("--downscale", type=int, default=1,
                    help="run the net at (H/d, W/d), upsample flow x d — "
                    "RAFT features only generalize near the trained scale")
    args = ap.parse_args()

    import bench
    from mav_detection_tpu.models import pretrained
    from mav_detection_tpu.models.raft import (
        PRODUCT_ITERS,
        check_flow_saturation,
        raft_flow,
        raft_flow_batch,
    )

    iters = args.iters or PRODUCT_ITERS
    h, w = HIRES_HW
    prev8, curr8, gt_flow = bench.make_scene(0, h=h, w=w,
                                             foe=(w * 0.41, h * 0.4),
                                             expansion=0.006,
                                             drone_pos=(430.0, 260.0),
                                             drone_vel=(6.0, 4.0),
                                             drone_radius=22.0)
    params = pretrained.load_raft_params()
    if params is None:
        print("no shipped checkpoint — refusing to report untrained numbers")
        return 1
    print(f"backend={jax.default_backend()} frame {w}x{h} iters={iters} "
          f"max |gt flow| {np.abs(gt_flow).max():.1f} px")

    # accuracy once (batch-independent): EPE vs the analytic GT.
    # With --downscale d the net runs at (h/d, w/d) and the flow is
    # bilinearly upsampled and scaled by d — RAFT's features (and the
    # shipped checkpoint) live at the trained scale, so native-res hires
    # inference extrapolates badly; this measures the reduced-scale path
    # the product uses instead.
    from mav_detection_tpu.ops.image.resize import resize

    d = args.downscale
    p3 = jnp.repeat(jnp.asarray(prev8, jnp.float32)[..., None], 3, -1)
    c3 = jnp.repeat(jnp.asarray(curr8, jnp.float32)[..., None], 3, -1)

    def net_flow(a, c):
        """Full-res (h, w, 2) flow; resize + rescale inside when d > 1."""
        if d > 1:
            a = resize(a, (h // d, w // d))
            c = resize(c, (h // d, w // d))
        f = raft_flow(params, a, c, iters)
        if d > 1:
            f = resize(f, (h, w)) * float(d)
        return f

    flow1 = np.asarray(net_flow(p3, c3))[None]
    assert not check_flow_saturation(flow1 / d), \
        "scene saturated the 16 px band at the net's working scale"
    epe_gt = float(np.linalg.norm(flow1[0] - gt_flow, axis=-1)
                   [16:-16, 16:-16].mean())
    print(f"EPE vs analytic GT (downscale {d}): {epe_gt:.4f} px")

    for b in (int(x) for x in args.batches.split(",")):
        pb = jnp.tile(p3[None], (b, 1, 1, 1))
        cb = jnp.tile(c3[None], (b, 1, 1, 1))

        # explicit vmap (the product's canary-selected path at batch < 8;
        # raft_flow_batch's host-side canary logic can't trace inside jit)
        @jax.jit
        def rep(pb, cb, n):
            def body(i, acc):
                f = jax.vmap(net_flow)(
                    pb + i.astype(jnp.float32) * 1e-3, cb)
                return acc + jnp.float32(jnp.sum(f[:, ::128, ::128]))
            return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

        try:
            float(rep(pb, cb, 1))  # compile + warm
        except Exception as e:
            print(json.dumps({"batch": b, "error": type(e).__name__}))
            print(f"  {e}")
            continue
        n = max(17 // b, 3)
        t0 = time.perf_counter(); float(rep(pb, cb, 1))
        t1 = time.perf_counter() - t0
        t0 = time.perf_counter(); float(rep(pb, cb, n))
        tn = time.perf_counter() - t0
        ms = (tn - t1) / ((n - 1) * b) * 1e3
        print(json.dumps({"batch": b, "ms_per_frame": round(ms, 2),
                          "fps_per_chip": round(1e3 / ms, 1),
                          "epe_gt": round(epe_gt, 4)}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
