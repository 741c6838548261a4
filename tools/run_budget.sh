#!/bin/bash
# Reference-budget-scale run (VERDICT r3 #5): 20k steps (10% of the
# reference's 200k protocol, scene241_full.sh:123-135) on the ScanNet-layout
# fixture with the lifecycle active, eval every 2.5k, and the LR decay
# profile scaled to the budget (reference: decay_iters=1M over 200k steps ->
# 100k over 20k).  Starts from the same holey bootstrap as run_lifecycle.sh
# so the 9 grow events have real work: the PSNR-vs-step curve shows the hole
# closing across grow cycles at reference-like cadence.  Evidence =
# scalars.jsonl curve, grown_points events, best-PSNR checkpoint tracking,
# late-training stability under the LR decay tail.
#   bash tools/run_budget.sh [steps]
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH=/root/repo:/root/.axon_site
STEPS=${1:-20000}
CKPT=.fixture/ckpts_r4
BOX="-0.9 -0.7 2.85 0.3 0.5 3.25"

echo "=== roomsim_budget ($STEPS steps) ==="
timeout 14400 python -m hybridneuralrendering_tpu.cli.train \
  --preset fixture_room --data-root .fixture --scan roomsim \
  --checkpoints-dir "$CKPT" --name roomsim_budget \
  --max-steps "$STEPS" --test-freq 2500 --test-num 8 \
  --lr-decay-iters $((STEPS * 5)) --drop-box $BOX \
  --prob-freq 2000 --prob-frames 3 --prune-iter 3000 --prune-thresh 0.1 \
  || { echo "TRAIN FAILED"; exit 1; }
timeout 1800 python -m hybridneuralrendering_tpu.cli.test \
  --preset fixture_room --data-root .fixture --scan roomsim \
  --checkpoints-dir "$CKPT" --name roomsim_budget
echo "--- scores ---"
cat "$CKPT/roomsim_budget_test/scores.txt"
echo "ALL DONE"
