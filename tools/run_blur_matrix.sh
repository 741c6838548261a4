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

# blurry-data matrix: mode x frame-weights
run_one roomblur off       0 roomblur_off
run_one roomblur bank      0 roomblur_bank
run_one roomblur learnable 0 roomblur_lrn
run_one roomblur off       1 roomblur_off_fw
run_one roomblur bank      1 roomblur_bank_fw
run_one roomblur learnable 1 roomblur_lrn_fw
# sharp-data controls: blur handling should be ~neutral
run_one roomsim  off       0 roomsim_off
run_one roomsim  bank      0 roomsim_bank
echo "ALL DONE"
