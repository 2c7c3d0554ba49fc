#!/bin/bash
# Round-4 session-5 battery, stage 3 (chained after battery2 by a pid
# watcher): the A/B-weights train + validate A/B retry (battery2's attempt
# died on a sys.path bug in ab_weights_train.py, fixed), then the fresh
# train-step device profile for the next residue hunt (train640 is 529.3
# img/s vs the 550 target; profiles/r3s8b_train640 predates the bf16-loss
# and uint8->bf16 normalization changes).
set -u
cd /root/repo

echo "=== A/B weights train $(date +%H:%M:%S) ==="
timeout 1800 python tools/ab_weights_train.py \
  --workdir /tmp/ab_weights --epochs 220 > /tmp/ab_weights.log 2>&1
echo "ab-weights exit $?"

echo "=== validate A/B $(date +%H:%M:%S) ==="
# -d: orbax checkpoints are DIRECTORIES; plain ls -t lists their contents
W=$(ls -dt /tmp/ab_weights/run/weights/best /tmp/ab_weights/run/weights/last 2>/dev/null | head -1)
timeout 2400 python tools/validate_ab.py --weights "$W" \
  --data /tmp/ab_weights/data_eval/data.yaml --img-size 1280 --batch-size 8 \
  --out profiles/validate_ab_r4.json > /tmp/validate_ab.log 2>&1
echo "validate A/B exit $?"

echo "=== profile_bench --train $(date +%H:%M:%S) ==="
timeout 2400 python tools/profile_bench.py --train --img 640 --batch 16 \
  --trace-dir profiles/r4s5_train640 > /tmp/profile_train_r4s5.log 2>&1
echo "profile exit $?"
echo "BATTERY3_DONE $(date +%H:%M:%S)"
