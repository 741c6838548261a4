#!/bin/bash
# Seed-repeat blur matrix (VERDICT r4 #2): the load-bearing quality A/B
# cells (blurry: off/bank/learnable; sharp: off/bank) x 3 seeds at 8k steps
# so every headline delta carries a spread, the learnable-kernel MLP gets a
# 4x budget (its round-4 deficit vs the bank was plausibly a 2k-step
# artifact), and the sharp+bank "+1.83 dB where the paper predicts neutral"
# anomaly is re-measured at longer budget.
#   bash tools/run_blur_seeds.sh [steps] [seeds...] [--cells "name:scan:mode ..."]
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH=/root/repo/.runsnap:/root/repo:/root/.axon_site
. tools/watchdog_lib.sh
STEPS=${1:-8000}
shift || true
SEEDS=${@:-"0 1 2"}
CKPT=.fixture/ckpts_r5

run_one () {  # scan blur_mode seed name
  local scan=$1 mode=$2 seed=$3 name=$4
  if [ -f "$CKPT/${name}_test/scores.txt" ]; then
    echo "=== $name done, skipping ==="; return 0
  fi
  echo "=== $name (scan=$scan blur=$mode seed=$seed) ==="
  wd_train "$CKPT/$name/log.txt" \
    python -m hybridneuralrendering_tpu.cli.train \
    --preset fixture_room --data-root .fixture --scan "$scan" \
    --checkpoints-dir "$CKPT" --name "$name" \
    --max-steps "$STEPS" --test-freq "$STEPS" --test-num 4 --prob-freq 0 \
    --save-freq 2000 \
    --blur-mode "$mode" --frame-weight 0 --seed "$seed" \
    || { echo "TRAIN FAILED: $name"; return 1; }
  timeout 2400 python -m hybridneuralrendering_tpu.cli.test \
    --preset fixture_room --data-root .fixture --scan "$scan" \
    --checkpoints-dir "$CKPT" --name "$name" \
    || { echo "TEST FAILED: $name"; return 1; }
  echo "--- scores $name ---"
  cat "$CKPT/${name}_test/scores.txt"
}

# priority order: the blurry off/bank/learnable triples carry the headline
# claims (blur damage, bank recovery, learnable-at-budget) — run ALL seeds
# of those before the sharp controls so a TPU-time cutoff still leaves
# per-seed paired deltas (summarize_seeds.py) for the main table.
for seed in $SEEDS; do
  run_one roomhfblur off       "$seed" "s${seed}_hfblur_off"
  run_one roomhfblur bank      "$seed" "s${seed}_hfblur_bank"
  run_one roomhfblur learnable "$seed" "s${seed}_hfblur_lrn"
done
for seed in $SEEDS; do
  run_one roomhf     off       "$seed" "s${seed}_hf_off"
  run_one roomhf     bank      "$seed" "s${seed}_hf_bank"
done
echo "ALL DONE"
