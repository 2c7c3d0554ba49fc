#!/bin/bash
# Round-5 chip battery 1 — runs AFTER tools/r5_accuracy_chain.sh releases the
# chip (one axon TPU client at a time). Most valuable first:
#   1. ab_serving AUTO   — the round-5 int8 candidates (stem on the 2x int8
#                          MXU path, neck end-to-end, both) vs base.
#   2. int8_serving_gate — mAP gate for those modes on converged parity-seed-1
#                          weights at the 1280 protocol (VERDICT r4 #4).
#   3. bench train640    — re-measure with the dense kernel-remap train stem
#                          (e161444; the old gather cost ~1.5 ms/step) —
#                          the >=550 img/s gate (VERDICT r4 #5).
#   4. validate_ab --paced — paced-ingest eval A/B: sync vs pipelined, both
#                          warm, PCIe-budget ingest (VERDICT r4 #3).
#   5. bench full        — fresh headline incl. the bounded sim-PCIe drain
#                          (advisor r4 medium).
# All artifacts land under /root/repo/profiles (wipe-proof).
set -u
cd /root/repo

CHAIN_PID=$(cat /tmp/r5_chain.pid 2>/dev/null || echo "")
if [ -n "$CHAIN_PID" ]; then
  echo "waiting for accuracy chain (pid $CHAIN_PID) ..."
  while kill -0 "$CHAIN_PID" 2>/dev/null; do sleep 30; done
fi
echo "chain done, battery starts $(date +%H:%M:%S)"

echo "=== ab_serving int8 candidates (AUTO layout) $(date +%H:%M:%S) ==="
timeout 3600 python tools/ab_serving.py --auto-layout \
  --variants base,int8stem,int8neck,int8both --rounds 24 \
  > profiles/ab_serving_int8_r5.log 2>&1
echo "ab_serving exit $?"

echo "=== int8 serving gate (mAP @1280, parity seed-1 weights) $(date +%H:%M:%S) ==="
W=$(ls -dt runs/parity_s1/run/weights/best runs/parity_s1/run/weights/last 2>/dev/null | head -1)
timeout 3600 python tools/int8_serving_gate.py --weights "$W" \
  --calib-data runs/parity_s1/data/data.yaml \
  --data runs/parity_s1/data_eval/data.yaml --img-size 1280 --batch-size 8 \
  --out profiles/int8_serving_gate_r5.json > profiles/int8_gate_r5.log 2>&1
echo "int8 gate exit $?"

echo "=== bench train640 (dense-remap re-measure) $(date +%H:%M:%S) ==="
SKYEYE_TRAIN640_BF16_ONLY=1 timeout 2400 python bench.py --config train640 \
  > profiles/bench_train640_r5.json 2> profiles/bench_train640_r5.log
echo "train640 exit $?"

echo "=== validate A/B paced-ingest $(date +%H:%M:%S) ==="
W=$(ls -dt runs/ab_weights/run/weights/best runs/ab_weights/run/weights/last 2>/dev/null | head -1)
timeout 3600 python tools/validate_ab.py --weights "$W" --paced \
  --data runs/ab_weights/data_eval/data.yaml --img-size 1280 --batch-size 8 \
  --out profiles/validate_ab_r5.json > profiles/validate_ab_r5.log 2>&1
echo "validate A/B exit $?"

echo "=== bench full $(date +%H:%M:%S) ==="
timeout 2400 python bench.py > profiles/bench_r5a.json 2> profiles/bench_r5a.log
echo "bench exit $?"
echo "BATTERY1_DONE $(date +%H:%M:%S)"
