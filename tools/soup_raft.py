"""Parameter-soup sweep between the shipped RAFT checkpoint and a fine-tune
candidate: evaluate alpha-interpolated weights against the full shipping
gates (in-family eval/drone EPE, detection TPR, cross-domain improvements)
and optionally ship the best alpha that passes everything.

Both endpoints descend from the same init, so linear interpolation is in
the same loss basin — often landing between each endpoint's failure modes
(the in-family drift of the fine-tune, the off-family collapse of the
shipped weights).

Run (detached, on the TPU):
    python tools/soup_raft.py --candidate /tmp/raft_candidate4.msgpack \
        --alphas 0.3 0.5 0.7 --ship
"""
from __future__ import annotations

import argparse
import json
import logging
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--candidate", required=True,
                    help="fine-tune candidate msgpack (alpha=1 endpoint)")
    ap.add_argument("--alphas", type=float, nargs="+",
                    default=[0.3, 0.5, 0.7])
    ap.add_argument("--ladder-gate", type=float, default=0.5,
                    help="max shift_ladder_epe a shippable soup may have "
                         "(PERF.md 'RAFT motion cap')")
    ap.add_argument("--ship", action="store_true")
    args = ap.parse_args()

    logging.basicConfig(level=logging.INFO,
                        format="%(asctime)s %(levelname)s %(message)s")
    log = logging.getLogger("soup")

    import jax

    from mav_detection_tpu.cli.train import (
        eval_raft,
        eval_raft_detection,
        shift_ladder_epe,
    )
    from mav_detection_tpu.models import checkpoint, pretrained
    from tools.finetune_raft import cross_domain

    shipped = pretrained.load_raft_params()
    cand = checkpoint.load_msgpack(args.candidate, shipped, migrate=pretrained._migrate_raft_state)

    epe0, depe0 = eval_raft(shipped)
    cd0 = cross_domain(shipped)
    lad0 = shift_ladder_epe(shipped)
    log.info(f"shipped: eval EPE {epe0:.4f} drone {depe0:.4f} "
             f"shift-ladder {lad0:.4f} | {json.dumps(cd0)}")

    best = None
    for alpha in args.alphas:
        soup = jax.tree_util.tree_map(
            lambda a, b: (1.0 - alpha) * a + alpha * b, shipped, cand)
        epe1, depe1 = eval_raft(soup)
        rtpr, gtpr = eval_raft_detection(soup)
        cd1 = cross_domain(soup)
        lad1 = shift_ladder_epe(soup)
        gates = {
            "eval_epe<=0.5": epe1 <= 0.5,
            "drone_epe<=0.5": depe1 <= 0.5,
            "det_tpr_within_0.05": abs(rtpr - gtpr) <= 0.05,
            "bench_epe_improves": cd1["bench_epe"] <= max(cd0["bench_epe"],
                                                          0.4),
            "bench_drone_improves":
                cd1["bench_drone_epe"] <= cd0["bench_drone_epe"],
            "sim_epe_improves": cd1["sim_epe"] <= max(cd0["sim_epe"], 0.7),
            # large-motion (round 5): the pan-curriculum candidate exists to
            # fix the >=4 px collapse — a soup may never ship it away
            "shift_ladder<=0.5": lad1 <= max(args.ladder_gate, 1e-9),
        }
        log.info(f"alpha={alpha}: eval EPE {epe1:.4f} drone {depe1:.4f} "
                 f"det TPR {rtpr:.4f}/{gtpr:.4f} ladder {lad1:.4f} | "
                 f"{json.dumps(cd1)} | gates {json.dumps(gates)}")
        if all(gates.values()):
            # among passers prefer the best worst-case drone-region EPE
            # across the three scene families — the detection-critical
            # region is what the framework exists for
            score = max(depe1, cd1["bench_drone_epe"], cd1["sim_drone_epe"])
            if best is None or score < best[1]:
                best = (alpha, score, soup)

    if best is None:
        log.info("no alpha passed all gates — nothing shipped")
        return
    alpha, _, soup = best
    out = "/tmp/raft_soup.msgpack"
    checkpoint.save_msgpack(out, soup)
    log.info(f"ALL GATES PASS at alpha={alpha} (saved {out})")
    if args.ship:
        shutil.copy(out, pretrained.checkpoint_path("raft"))
        pretrained.clear_cache()
        log.info(f"shipped to {pretrained.checkpoint_path('raft')}")


if __name__ == "__main__":
    main()
