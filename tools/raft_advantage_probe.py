"""Demonstrate-or-demote RAFT (VERDICT r4 #9).

Farneback beats RAFT on every scene family measured through round 4 (PERF.md
"Cross-domain"). If RAFT earns its place in the product it must be on the
failure modes of LOCAL least squares — this probe builds those scene
families with analytic GT and scores both flow sources head-to-head:

* ``grating``   — periodic texture, shift near half the period: the local
                  solve aliases to the nearest lattice displacement (the
                  aperture problem); a learned prior can pick the true one.
* ``lowcontrast`` — texture amplitude ~2 gray levels over a flat field:
                  gradients vanish, the local normal equations go singular.
* ``boundary``  — two textured half-planes moving differently: the 13x13
                  box-blurred normal equations smear flow across the motion
                  discontinuity; measured in a ±8 px band around it.
* ``control``   — the blurred-noise bench texture (Farneback's home turf).

Each family reports interior EPE for Farneback (tuned product params) and
RAFT (shipped checkpoint, product iters). The verdict line states which
families RAFT wins by >20% — the statement of record for README/PERF.

Run: python tools/raft_advantage_probe.py [--cpu] [--size 240x320]
"""
from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax


def _warp_shift(img: np.ndarray, dx: float, dy: float) -> np.ndarray:
    import cv2

    M = np.float32([[1, 0, dx], [0, 1, dy]])
    return cv2.warpAffine(img, M, (img.shape[1], img.shape[0]),
                          flags=cv2.INTER_LINEAR,
                          borderMode=cv2.BORDER_REFLECT)


def make_families(h: int, w: int, seed: int = 7) -> dict:
    """name -> (prev, curr, gt_flow (h, w, 2))."""
    import cv2

    rng = np.random.default_rng(seed)
    ys, xs = np.mgrid[0:h, 0:w].astype(np.float32)
    fams = {}

    def uniform(prev, d):
        gt = np.broadcast_to(np.asarray(d, np.float32), (h, w, 2)).copy()
        return prev, _warp_shift(prev, d[0], d[1]), gt

    # grating: period 8 px, true shift 3 px — the nearest alias is -5 px,
    # and a 12 px window sees ~1.5 periods (pure aperture ambiguity)
    grat = (128.0 + 60.0 * np.sin(2 * np.pi * xs / 8.0)).astype(np.float32)
    fams["grating"] = uniform(grat, (3.0, 1.0))

    # low contrast: ±2 gray levels of smooth texture
    base = cv2.GaussianBlur(rng.random((h, w)).astype(np.float32), (0, 0), 3.0)
    base = (base - base.mean()) / max(base.std(), 1e-9)
    fams["lowcontrast"] = uniform((128.0 + 2.0 * base).astype(np.float32),
                                  (3.0, 1.0))

    # motion boundary: left half-plane still, right half-plane moving 4 px
    tex = cv2.GaussianBlur(rng.random((h, w)).astype(np.float32), (0, 0), 1.5)
    tex = (tex - tex.min()) / max(np.ptp(tex), 1e-6) * 220 + 20
    moved = _warp_shift(tex, 4.0, 0.0)
    half = xs >= w / 2
    prev = tex.astype(np.float32)
    curr = np.where(half, moved, tex).astype(np.float32)
    gt = np.zeros((h, w, 2), np.float32)
    gt[..., 0] = np.where(half, 4.0, 0.0)
    fams["boundary"] = (prev, curr, gt)

    # control: the bench-family texture
    fams["control"] = uniform(tex.astype(np.float32), (3.0, 1.0))
    return fams


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", default="240x320", metavar="HxW")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp

    from mav_detection_tpu.models import pretrained
    from mav_detection_tpu.models.raft import raft_flow
    from mav_detection_tpu.ops.flow import farneback_flow, tuned_flow_params

    h, w = (int(v) for v in args.size.split("x"))
    params = tuned_flow_params(h, w)
    raft_params = pretrained.load_raft_params()
    if raft_params is None:
        print("no shipped RAFT checkpoint")
        return 1

    wins = []
    for name, (prev, curr, gt) in make_families(h, w).items():
        fb = np.asarray(farneback_flow(jnp.asarray(prev), jnp.asarray(curr),
                                       params))
        rf = np.asarray(raft_flow(raft_params, jnp.asarray(prev),
                                  jnp.asarray(curr)))
        if name == "boundary":
            bx = int(w / 2)
            mask = np.zeros((h, w), bool)
            mask[16:-16, max(bx - 8, 0):bx + 8] = True
        else:
            mask = np.zeros((h, w), bool)
            mask[16:-16, 16:-16] = True
        fb_epe = float(np.linalg.norm(fb - gt, axis=-1)[mask].mean())
        rf_epe = float(np.linalg.norm(rf - gt, axis=-1)[mask].mean())
        row = {"family": name, "farneback_epe": round(fb_epe, 4),
               "raft_epe": round(rf_epe, 4),
               "raft_wins": rf_epe < 0.8 * fb_epe}
        if row["raft_wins"]:
            wins.append(name)
        print(json.dumps(row))

    print(json.dumps({"verdict": (
        f"RAFT wins {wins} by >20%" if wins else
        "RAFT wins no family — demote to the trainable/research path")}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
