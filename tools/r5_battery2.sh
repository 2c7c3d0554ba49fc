#!/bin/bash
# Round-5 chip battery 2 — runs after battery 1 releases the chip.
#   1. bench train640 with SKYEYE_DENSE_LOSS=1 — the dense-cotangent loss
#      A/B (aba85f6): expected ~2.3 ms/step of scatter+layout churn removed
#      (profiles/r4s5_train640 attribution); gate vs the battery-1 exact run.
#   2. profile_bench --train under the dense loss — fresh per-op attribution
#      for whatever residue remains.
set -u
cd /root/repo

B1_PID=$(cat /tmp/r5_battery1.pid 2>/dev/null || echo "")
if [ -n "$B1_PID" ]; then
  echo "waiting for battery 1 (pid $B1_PID) ..."
  while kill -0 "$B1_PID" 2>/dev/null; do sleep 30; done
fi
echo "battery 2 starts $(date +%H:%M:%S)"

echo "=== bench train640 DENSE loss $(date +%H:%M:%S) ==="
SKYEYE_DENSE_LOSS=1 SKYEYE_TRAIN640_BF16_ONLY=1 timeout 2400 python bench.py \
  --config train640 \
  > profiles/bench_train640_dense_r5.json 2> profiles/bench_train640_dense_r5.log
echo "train640 dense exit $?"

echo "=== profile_bench --train (dense loss) $(date +%H:%M:%S) ==="
SKYEYE_DENSE_LOSS=1 timeout 2400 python tools/profile_bench.py --train \
  --img 640 --batch 16 --trace-dir profiles/r5_train640_dense \
  > profiles/r5_train640_dense.log 2>&1
echo "profile exit $?"
echo "BATTERY2_DONE $(date +%H:%M:%S)"
