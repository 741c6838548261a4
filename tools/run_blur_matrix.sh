#!/bin/bash
# Blur-aware training evidence matrix (VERDICT r3 #1): train + eval each
# blur-handling mode on the motion-blurred fixture scene (roomblur: 4 of 8
# train frames degraded by real multi-pose rendering; test views sharp) and
# sharp controls on roomsim.  Runs serially on the one TPU chip.
#   bash tools/run_blur_matrix.sh [steps]
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH=/root/repo:/root/.axon_site
STEPS=${1:-2000}
CKPT=.fixture/ckpts_r4
mkdir -p "$CKPT"

run_one () {  # scan blur_mode fw name
  local scan=$1 mode=$2 fw=$3 name=$4
  echo "=== $name (scan=$scan blur=$mode fw=$fw) ==="
  timeout 3600 python -m hybridneuralrendering_tpu.cli.train \
    --preset fixture_room --data-root .fixture --scan "$scan" \
    --checkpoints-dir "$CKPT" --name "$name" \
    --max-steps "$STEPS" --test-freq "$STEPS" --test-num 4 --prob-freq 0 \
    --blur-mode "$mode" --frame-weight "$fw" \
    || { echo "TRAIN FAILED: $name"; return 1; }
  timeout 1800 python -m hybridneuralrendering_tpu.cli.test \
    --preset fixture_room --data-root .fixture --scan "$scan" \
    --checkpoints-dir "$CKPT" --name "$name" --blur-mode "$mode" \
    || { echo "TEST FAILED: $name"; return 1; }
  echo "--- scores $name ---"
  cat "$CKPT/${name}_test/scores.txt"
}

# blurry-data matrix (high-frequency texture, 6/8 train frames motion-
# blurred at 7.6-16.9 px): mode x frame-weights
run_one roomhfblur off       0 hfblur_off
run_one roomhfblur bank      0 hfblur_bank
run_one roomhfblur learnable 0 hfblur_lrn
run_one roomhfblur off       1 hfblur_off_fw
run_one roomhfblur bank      1 hfblur_bank_fw
run_one roomhfblur learnable 1 hfblur_lrn_fw
# sharp-data controls (same texture, no blur): blur handling ~neutral
run_one roomhf  off       0 hf_off
run_one roomhf  bank      0 hf_bank
echo "ALL DONE"
