#!/bin/bash
# Round-4 session-5 battery, stage 2 (after quant finished the stage-1 list):
#   1. bench.py full      — live-verify the tiny-summary sim-PCIe drain fix.
#   2. lean A/B weights   — tools/ab_weights_train.py (cli.train only; the
#                           map_parity route wastes ~20 min on the torch side).
#   3. validate A/B       — VERDICT r3 #2 live artifact (pipelined vs sync).
#   4. ab_serving         — staged MFU candidates under the shipped AUTO input
#                           layout: stembf16, spattn, packedm re-test.
set -u
cd /root/repo

echo "=== bench full (sim-PCIe drain fix) $(date +%H:%M:%S) ==="
timeout 2400 python bench.py > /tmp/bench_r4s5b.json 2> /tmp/bench_r4s5b.log
echo "bench exit $?"

echo "=== A/B weights train $(date +%H:%M:%S) ==="
PYTHONPATH=/root/repo/tools timeout 1800 python tools/ab_weights_train.py \
  --workdir /tmp/ab_weights --epochs 220 > /tmp/ab_weights.log 2>&1
echo "ab-weights exit $?"

echo "=== validate A/B $(date +%H:%M:%S) ==="
# -d: orbax checkpoints are DIRECTORIES; plain ls -t lists their contents
W=$(ls -dt /tmp/ab_weights/run/weights/best /tmp/ab_weights/run/weights/last 2>/dev/null | head -1)
timeout 2400 python tools/validate_ab.py --weights "$W" \
  --data /tmp/ab_weights/data_eval/data.yaml --img-size 1280 --batch-size 8 \
  --out profiles/validate_ab_r4.json > /tmp/validate_ab.log 2>&1
echo "validate A/B exit $?"

echo "=== ab_serving AUTO-layout candidates $(date +%H:%M:%S) ==="
timeout 2400 python tools/ab_serving.py --auto-layout \
  --variants base,stembf16,spattn,packedm --rounds 24 \
  > /tmp/ab_serving_r4s5.log 2>&1
echo "ab_serving exit $?"
echo "BATTERY2_DONE $(date +%H:%M:%S)"
