#!/bin/bash
# Round-5 battery 3 — runs between master4's AUTO roofline and the DEVAUG
# marathon (master4 is split at that point so these short chip jobs are not
# starved by the 85-min devaug trainings).
#   1. profile_bench --train + attrib under SKYEYE_DENSE_LOSS=1 — fresh per-op
#      attribution of whatever train-step residue remains after the dense
#      kernel-remap (e161444) + dense-cotangent loss (aba85f6).
#   2. int8_serving_gate @1280 on the ab_weights converged weights — the
#      chip-side mAP gate for quantize_int8 (the session-3 gate ran on CPU).
set -u
cd /root/repo

echo "=== profile_bench --train (dense loss) $(date +%H:%M:%S) ==="
SKYEYE_DENSE_LOSS=1 timeout 2400 python tools/profile_bench.py --train \
  --img 640 --batch 16 --trace-dir profiles/r5_train640_dense \
  > profiles/r5_train640_dense.log 2>&1
echo "profile exit $?"
timeout 600 python tools/roofline_attrib.py --dir profiles/r5_train640_dense \
  --out profiles/r5_train640_dense/roofline_attrib.json \
  > profiles/r5_train640_dense_attrib.log 2>&1
echo "attrib exit $?"

echo "=== int8 serving gate (mAP @1280, ab_weights) $(date +%H:%M:%S) ==="
W=$(ls -dt runs/ab_weights/run/weights/best runs/ab_weights/run/weights/last 2>/dev/null | head -1)
if [ -n "$W" ]; then
  timeout 3600 python tools/int8_serving_gate.py --weights "$W" \
    --calib-data runs/ab_weights/data/data.yaml \
    --data runs/ab_weights/data_eval/data.yaml --img-size 1280 --batch-size 8 \
    --out profiles/int8_serving_gate_r5.json > profiles/int8_gate_r5.log 2>&1
  echo "int8 gate exit $?"
else
  echo "int8 gate skipped: no ab_weights checkpoint"
fi
echo "BATTERY3_DONE $(date +%H:%M:%S)"
