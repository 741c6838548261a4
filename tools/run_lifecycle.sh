#!/bin/bash
# Point-lifecycle evidence (VERDICT r3 #2): carve a hole into the bootstrap
# cloud (drop-box over part of the back wall), then train WITH the in-process
# probe/grow/prune lifecycle vs a frozen-topology control.  Evidence =
# grown-point counts + eval-PSNR delta in scalars.jsonl / log.txt.
#   bash tools/run_lifecycle.sh [steps]
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH=/root/repo:/root/.axon_site
STEPS=${1:-4000}
CKPT=.fixture/ckpts_r4
# hole: a patch of the back wall (room spans x[-1.6,1.6] y[-1.2,1.2] z[0,3.2])
BOX="-0.9 -0.7 2.85 0.3 0.5 3.25"

run () {  # name extra-args...
  local name=$1; shift
  echo "=== $name ==="
  timeout 7200 python -m hybridneuralrendering_tpu.cli.train \
    --preset fixture_room --data-root .fixture --scan roomsim \
    --checkpoints-dir "$CKPT" --name "$name" \
    --max-steps "$STEPS" --test-freq 1000 --test-num 8 \
    --drop-box $BOX "$@" \
    || { echo "TRAIN FAILED: $name"; return 1; }
  timeout 1800 python -m hybridneuralrendering_tpu.cli.test \
    --preset fixture_room --data-root .fixture --scan roomsim \
    --checkpoints-dir "$CKPT" --name "$name" \
    || { echo "TEST FAILED: $name"; return 1; }
  echo "--- scores $name ---"
  cat "$CKPT/${name}_test/scores.txt"
}

run roomhole_ctl  --prob-freq 0
run roomhole_grow --prob-freq 1000 --prob-frames 3 \
                  --prune-iter 1500 --prune-thresh 0.1
echo "ALL DONE"
