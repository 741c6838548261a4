#!/bin/bash
# Hole-closure protocol (round 5, VERDICT r4 #1 + #2's intact control).
#
# Round-4 diagnosis (tools/diag_hole.py on the r4 budget checkpoints):
# in-box points peaked at 2,931 @7.5k then DECLINED to 1,961; closure
# plateaued at 26%; in-box conf p10 fell to ~0 — grown points were dying
# and being pruned.  The reference's ScanNet protocol runs with pruning
# DISABLED (scene241_full.sh:19-20 prune_thresh=-1 prune_iter=-1) and ~20
# probe events over the budget (prob_freq=10000 over 200k).  Round-4 used
# 9 events + aggressive pruning — the mechanism gap.
#
# Fix protocol (20k steps = 10% of the reference budget):
#   - prune disabled (reference parity for this protocol)
#   - probe every 1000 steps -> 19 grow events (reference event count)
#   - probe ALL 8 training frames per event (the reference probes
#     len(dataset)/prob_num_step of its ~1900 frames = ~19; at 8 train
#     frames ours is all of them)
#   - capacity raised to 520k with the base cloud pinned at 400k
#     (--bootstrap-cap) so cumulative growth has free slots
#   - intact control at the same budget/protocol = the ceiling
#
#   bash tools/run_closure.sh [steps] [intact|holey|both]
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH=/root/repo/.runsnap:/root/repo:/root/.axon_site
. tools/watchdog_lib.sh
STEPS=${1:-20000}
WHICH=${2:-both}
CKPT=.fixture/ckpts_r5
BOX="-0.9 -0.7 2.85 0.3 0.5 3.25"

run_one () {  # name extra-args...
  local name=$1; shift
  echo "=== $name ($STEPS steps) ==="
  wd_train "$CKPT/$name/log.txt" \
    python -m hybridneuralrendering_tpu.cli.train \
    --preset fixture_room --data-root .fixture --scan roomsim \
    --checkpoints-dir "$CKPT" --name "$name" \
    --max-steps "$STEPS" --test-freq 2500 --test-num 8 --save-freq 2500 \
    --lr-decay-iters $((STEPS * 5)) \
    --prob-freq 1000 --prob-frames 8 --prune-iter -1 \
    "$@" || { echo "TRAIN FAILED: $name"; return 1; }
  timeout 2400 python -m hybridneuralrendering_tpu.cli.test \
    --preset fixture_room --data-root .fixture --scan roomsim \
    --checkpoints-dir "$CKPT" --name "$name" \
    || { echo "TEST FAILED: $name"; return 1; }
  echo "--- scores $name ---"
  cat "$CKPT/${name}_test/scores.txt"
}

if [ "$WHICH" = "intact" ] || [ "$WHICH" = "both" ]; then
  run_one roomintact_r5
fi
if [ "$WHICH" = "holey" ] || [ "$WHICH" = "both" ]; then
  run_one roomhole_r5 --drop-box $BOX \
    --num-points 600000 --bootstrap-cap 400000
fi
echo "ALL DONE"
