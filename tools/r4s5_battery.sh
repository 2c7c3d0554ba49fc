#!/bin/bash
# Round-4 session-5 chip battery. /tmp was wiped between sessions, so the
# session-4 follow-up battery never produced artifacts and the parity-chain
# weights are gone. Re-run the remaining VERDICT-r3 measurements serially,
# most valuable first (chip is single-client through the axon relay):
#   1. bench.py full        — fresh headline + verifies the async-drain
#                             sim-PCIe rewrite live (VERDICT #6; the 254.7
#                             first cut was a sync-D2H artifact).
#   2. bench train640       — idle re-measure, bf16 headline (VERDICT #3).
#   3. bench burstsweep     — latency/throughput frontier (VERDICT #8).
#   4. quant_deep_bench     — int8 stages 3-4 + neck unit shapes (VERDICT #5).
#   5. short train (220 ep) — weights for the validate A/B, then
#      validate_ab          — pipelined-vs-sync live measure (VERDICT #2).
set -u
cd /root/repo

echo "=== bench full $(date +%H:%M:%S) ==="
timeout 2400 python bench.py > /tmp/bench_r4s5.json 2> /tmp/bench_r4s5.log
echo "bench full exit $?"

echo "=== bench train640 $(date +%H:%M:%S) ==="
SKYEYE_TRAIN640_BF16_ONLY=1 timeout 2400 python bench.py --config train640 \
  > /tmp/bench_train640_r4s5.json 2> /tmp/bench_train640_r4s5.log
echo "train640 exit $?"

echo "=== burst sweep $(date +%H:%M:%S) ==="
timeout 1800 python bench.py --config burstsweep \
  > /tmp/bench_burstsweep.json 2> /tmp/bench_burstsweep.log
echo "burstsweep exit $?"

echo "=== quant deep bench $(date +%H:%M:%S) ==="
timeout 2400 python tools/quant_deep_bench.py --batch 16 --img 1280 \
  > /tmp/quant_deep.log 2>&1
echo "quant exit $?"

echo "=== A/B weights train (220 epochs, speed-measure weights only) $(date +%H:%M:%S) ==="
timeout 2400 python tools/map_parity.py --img-size 320 --eval-img-size 1280 \
  --epochs 220 --n-val 200 --seed 7 --workdir /tmp/ab_weights \
  > /tmp/ab_weights.log 2>&1
echo "ab-weights exit $?"

echo "=== validate A/B $(date +%H:%M:%S) ==="
# -d: orbax checkpoints are DIRECTORIES; plain ls -t lists their contents
W=$(ls -dt /tmp/ab_weights/run/weights/best /tmp/ab_weights/run/weights/last 2>/dev/null | head -1)
timeout 2400 python tools/validate_ab.py --weights "$W" \
  --data /tmp/ab_weights/data_eval/data.yaml --img-size 1280 --batch-size 8 \
  --out profiles/validate_ab_r4.json > /tmp/validate_ab.log 2>&1
echo "validate A/B exit $?"
echo "BATTERY_DONE $(date +%H:%M:%S)"
