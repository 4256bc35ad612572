#!/usr/bin/env bash
# Chained pan-curriculum RAFT retrain (PERF.md "pan-curriculum" sections).
#
# Phase 1 teaches large motion (uniform pans to 12 px) at the cost of the
# small-motion family; phase 2 consolidates by continued training with the
# pan annealed to 6 px; phase 3 feeds the sim-like texture family back in
# (sin-blend 0.85) at pan 9 px and SHIPS only if every gate passes,
# including the absolute shift_ladder<=0.5 px large-motion gate.
#
# Needs ~4.5 h of quiet chip through the dev tunnel (0.4 steps/s); each
# phase is restartable — candidates persist under checkpoints/candidates/.
#
#   nohup bash tools/run_pan_curriculum.sh > /tmp/pan_curriculum.log 2>&1 &
set -euo pipefail
cd "$(dirname "$0")/.."
CAND=checkpoints/candidates
mkdir -p "$CAND"

if [ ! -f "$CAND/phase1.msgpack" ]; then
  python tools/finetune_raft.py --pan-max 12 --steps 2000 --lr 8e-5 \
      --sin-blend 0.6 --candidate "$CAND/phase1.msgpack"
fi
if [ ! -f "$CAND/phase2.msgpack" ]; then
  python tools/finetune_raft.py --init "$CAND/phase1.msgpack" \
      --pan-max 6 --steps 2000 --lr 4e-5 --sin-blend 0.6 \
      --candidate "$CAND/phase2.msgpack"
fi
python tools/finetune_raft.py --init "$CAND/phase2.msgpack" \
    --pan-max 9 --steps 2000 --lr 3e-5 --sin-blend 0.85 \
    --candidate "$CAND/phase3.msgpack" --ship
