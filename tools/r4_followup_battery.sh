#!/bin/bash
# Round-4 follow-up chip battery. Waits for the parity chain (pid in
# /tmp/parity_chain.pid) to release the chip, then runs the remaining
# VERDICT-r3 measurements serially, most valuable first:
#   1. validate A/B (VERDICT #2)  — failed in the chain on the ls-directory
#      bug; weights path resolution fixed with ls -dt.
#   2. bench.py full (VERDICT #6) — fresh sim-PCIe streaming measurement with
#      the async side-drain (the 254.7 reading was a sync-D2H artifact).
#   3. bench.py train640 bf16-only (VERDICT #3) — last reading (27 img/s) was
#      taken under pytest CPU saturation; re-measure idle.
#   4. quant_deep_bench (VERDICT #5) — int8 stages 3-4 + neck unit shapes.
#   5. bench.py burstsweep (VERDICT #8) — latency/throughput frontier.
set -u
cd /root/repo
CHAIN_PID=$(cat /tmp/parity_chain.pid 2>/dev/null)
if [ -n "${CHAIN_PID:-}" ]; then
  while kill -0 "$CHAIN_PID" 2>/dev/null; do sleep 30; done
fi
echo "=== chain released chip $(date +%H:%M:%S) ==="

echo "=== validate A/B $(date +%H:%M:%S) ==="
W=$(ls -dt /tmp/parity_s0/run/weights/best /tmp/parity_s0/run/weights/last 2>/dev/null | head -1)
timeout 2400 python tools/validate_ab.py --weights "$W" \
  --data /tmp/parity_s0/data_eval/data.yaml --img-size 1280 --batch-size 8 \
  --out profiles/validate_ab_r4.json > /tmp/validate_ab.log 2>&1
echo "validate A/B exit $?"

echo "=== bench full $(date +%H:%M:%S) ==="
timeout 3600 python bench.py > /tmp/bench_r4s5.json 2> /tmp/bench_r4s5.log
echo "bench full exit $?"

echo "=== bench train640 $(date +%H:%M:%S) ==="
SKYEYE_TRAIN640_BF16_ONLY=1 timeout 3600 python bench.py --config train640 \
  > /tmp/bench_train640_r4s5.json 2> /tmp/bench_train640_r4s5.log
echo "train640 exit $?"

echo "=== quant deep bench $(date +%H:%M:%S) ==="
timeout 3600 python tools/quant_deep_bench.py --batch 16 --img 1280 \
  > /tmp/quant_deep.log 2>&1
echo "quant exit $?"

echo "=== burst sweep $(date +%H:%M:%S) ==="
timeout 2400 python bench.py --config burstsweep \
  > /tmp/bench_burstsweep.json 2> /tmp/bench_burstsweep.log
echo "burstsweep exit $?"
echo "BATTERY_DONE $(date +%H:%M:%S)"
