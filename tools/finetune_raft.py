"""RAFT fine-tune driver: resume the shipped checkpoint on the broadened
domain-randomized generator (small intruders + sinusoidal texture family),
select with the min-over-gates two-fixture score, then gate the candidate
against the shipped weights on BOTH the in-family eval fixture and the
cross-domain scenes before overwriting ``checkpoints/raft.msgpack``.

Run (detached, on the TPU):
    python tools/finetune_raft.py --steps 2000 --lr 8e-5
"""
from __future__ import annotations

import argparse
import json
import logging
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def cross_domain(params) -> dict:
    import numpy as np

    import jax.numpy as jnp

    import bench
    from mav_detection_tpu.models.raft import PRODUCT_ITERS, raft_flow
    from tools.cross_domain_eval import mock_sim_metrics

    out = {}
    # bench family @240x320, 2 seeds (RAFT only, to keep the run short)
    epes, depes = [], []
    for seed in (1, 2):
        scale = 0.5
        foe = (bench.FOE[0] * 320 / bench.W, bench.FOE[1] * 240 / bench.H)
        pos = (170.0 * 320 / bench.W, 120.0 * 240 / bench.H)
        r = max(10.0 * min(240 / bench.H, 320 / bench.W), 4.0)
        prev8, curr8, gt = bench.make_scene(
            seed, h=240, w=320, foe=foe, drone_pos=pos,
            drone_vel=(4.0 * scale, 2.5 * scale), drone_radius=r)
        fl = np.asarray(raft_flow(params, jnp.asarray(prev8),
                                  jnp.asarray(curr8), iters=PRODUCT_ITERS))
        err = np.linalg.norm(fl - gt, axis=-1)
        epes.append(float(err[16:-16, 16:-16].mean()))
        drone = ((np.arange(320)[None, :] - pos[0]) ** 2
                 + (np.arange(240)[:, None] - pos[1]) ** 2 <= r ** 2)
        depes.append(float(err[drone].mean()))
    out["bench_epe"] = sum(epes) / len(epes)
    out["bench_drone_epe"] = sum(depes) / len(depes)
    sim = mock_sim_metrics(iters=0, raft_params=params)
    out["sim_epe"] = sim["raft_epe"]
    out["sim_drone_epe"] = sim["raft_drone_epe"]
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=2000)
    ap.add_argument("--lr", type=float, default=8e-5)
    ap.add_argument("--drone-weight", type=float, default=40.0)
    ap.add_argument("--sin-blend", type=float, default=0.6,
                    help="cap on the sinusoid texture blend in the training "
                         "generator (0 = pure in-family blurred noise)")
    ap.add_argument("--pan-max", type=float, default=0.0,
                    help="large-motion curriculum: per-axis camera pan up "
                         "to this many px added to every scene's flow "
                         "(PERF.md 'RAFT motion cap'); adds the uniform-"
                         "shift ladder to selection and gating")
    ap.add_argument("--chunk", type=int, default=50)
    ap.add_argument("--candidate",
                    default=os.path.join(os.path.dirname(os.path.dirname(
                        os.path.abspath(__file__))), "checkpoints",
                        "candidates", "raft_candidate.msgpack"),
                    help="where to keep the trained-but-unshipped weights; "
                         "defaults under the repo (gitignored) so a session "
                         "restart does not lose a curriculum phase the way "
                         "/tmp candidates were lost twice")
    ap.add_argument("--init", default="",
                    help="resume training from this msgpack instead of the "
                         "shipped checkpoint (gates still compare against "
                         "shipped)")
    ap.add_argument("--ship", action="store_true",
                    help="overwrite the repo checkpoint if all gates pass")
    args = ap.parse_args()
    os.makedirs(os.path.dirname(os.path.abspath(args.candidate)),
                exist_ok=True)

    logging.basicConfig(level=logging.INFO,
                        format="%(asctime)s %(levelname)s %(message)s")
    log = logging.getLogger("finetune")

    from mav_detection_tpu.cli.train import (
        eval_raft,
        eval_raft_detection,
        shift_ladder_epe,
        train_raft,
    )
    from mav_detection_tpu.models import checkpoint, pretrained

    shipped = pretrained.load_raft_params()
    assert shipped is not None, "no shipped checkpoint to resume from"

    log.info("=== shipped baseline ===")
    epe0, depe0 = eval_raft(shipped)
    cd0 = cross_domain(shipped)
    lad0 = shift_ladder_epe(shipped)
    log.info(f"shipped: eval EPE {epe0:.4f} drone {depe0:.4f} "
             f"shift-ladder {lad0:.4f} | {json.dumps(cd0)}")

    init = shipped
    if args.init:
        init = checkpoint.load_msgpack(args.init, shipped, migrate=pretrained._migrate_raft_state)
        log.info(f"resuming from {args.init}")

    params, _ = train_raft(steps=args.steps, chunk=args.chunk,
                           peak_lr=args.lr, init_params=init,
                           drone_weight=args.drone_weight,
                           sin_blend=args.sin_blend,
                           pan_max=args.pan_max,
                           save_best_to=args.candidate)
    checkpoint.save_msgpack(args.candidate, params)

    log.info("=== candidate ===")
    epe1, depe1 = eval_raft(params)
    rtpr, gtpr = eval_raft_detection(params)
    cd1 = cross_domain(params)
    lad1 = shift_ladder_epe(params)
    log.info(f"candidate: eval EPE {epe1:.4f} drone {depe1:.4f} "
             f"det TPR {rtpr:.4f} vs GT {gtpr:.4f} "
             f"shift-ladder {lad1:.4f} | {json.dumps(cd1)}")

    gates = {
        "eval_epe<=0.5": epe1 <= 0.5,
        "drone_epe<=0.5": depe1 <= 0.5,
        "det_tpr_within_0.05": abs(rtpr - gtpr) <= 0.05,
        "bench_epe_improves": cd1["bench_epe"] <= max(cd0["bench_epe"], 0.4),
        "bench_drone_improves": cd1["bench_drone_epe"] <= cd0["bench_drone_epe"],
        "sim_epe_improves": cd1["sim_epe"] <= max(cd0["sim_epe"], 0.7),
        # large-motion: never regress the ladder; with the pan curriculum
        # demand it actually lands under the small-motion gate too
        "shift_ladder_improves": lad1 <= lad0,
        **({"shift_ladder<=0.5": lad1 <= 0.5} if args.pan_max > 0 else {}),
    }
    log.info(f"gates: {json.dumps(gates)}")
    if all(gates.values()):
        log.info("ALL GATES PASS")
        if args.ship:
            shutil.copy(args.candidate, pretrained.checkpoint_path("raft"))
            pretrained.clear_cache()
            log.info(f"shipped to {pretrained.checkpoint_path('raft')}")
    else:
        log.info("gates failed — NOT shipping (candidate kept at "
                 f"{args.candidate})")


if __name__ == "__main__":
    main()
