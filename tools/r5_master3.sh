#!/bin/bash
# Round-5 master sequencer v3 — fresh-VM restart (runs/ and /tmp wiped, the
# session-3/4 batteries were interrupted after parity seed 2 landed).
# Remaining VERDICT-r4 gates, most valuable first; DEVAUG (85 min/seed) last.
#   1. bench train640 exact        — dense kernel-remap re-measure (>=550 gate)
#   2. bench train640 dense loss   — SKYEYE_DENSE_LOSS=1 A/B (aba85f6)
#   3. ab_weights_train            — throwaway converged weights + fixed
#                                    200-image 1280 eval split (runs/ wiped)
#   4. validate_ab --paced         — paced-ingest sync-vs-pipelined, both warm
#   5. bench full                  — fresh headline under AUTO layout
#   6. devaug seed 1 (+aggregate)  — the 2-seed repeat's second seed (r3=seed0)
#   7. devaug seed 2 (+aggregate)  — bonus third seed if wall clock allows
# All artifacts land under /root/repo/profiles (wipe-proof).
set -u
cd /root/repo
mkdir -p runs profiles

echo "=== bench train640 exact $(date +%H:%M:%S) ==="
SKYEYE_TRAIN640_BF16_ONLY=1 timeout 2400 python bench.py --config train640 \
  > profiles/bench_train640_r5.json 2> profiles/bench_train640_r5.log
echo "train640 exact exit $?"

echo "=== bench train640 DENSE loss $(date +%H:%M:%S) ==="
SKYEYE_DENSE_LOSS=1 SKYEYE_TRAIN640_BF16_ONLY=1 timeout 2400 python bench.py \
  --config train640 \
  > profiles/bench_train640_dense_r5.json 2> profiles/bench_train640_dense_r5.log
echo "train640 dense exit $?"

echo "=== ab_weights_train $(date +%H:%M:%S) ==="
timeout 3600 python tools/ab_weights_train.py --workdir runs/ab_weights \
  > runs/ab_weights.log 2>&1
echo "ab_weights exit $?"

echo "=== validate A/B paced-ingest $(date +%H:%M:%S) ==="
W=$(ls -dt runs/ab_weights/run/weights/best runs/ab_weights/run/weights/last 2>/dev/null | head -1)
timeout 3600 python tools/validate_ab.py --weights "$W" --paced \
  --data runs/ab_weights/data_eval/data.yaml --img-size 1280 --batch-size 8 \
  --out profiles/validate_ab_r5.json > profiles/validate_ab_r5.log 2>&1
echo "validate A/B exit $?"

echo "=== bench full $(date +%H:%M:%S) ==="
timeout 2400 python bench.py > profiles/bench_r5a.json 2> profiles/bench_r5a.log
echo "bench exit $?"

run_devaug() {
  s=$1
  echo "=== devaug seed $s $(date +%H:%M:%S) ==="
  timeout 9000 python tools/device_aug_demo.py --overfit --epochs 600 \
    --seed "$s" --workdir "runs/devaug_s$s" \
    > "runs/devaug_s$s.log" 2>&1
  echo "devaug seed $s exit $?"
  cp "runs/devaug_s$s/device_aug_demo.json" "profiles/devaug_r5_seed$s.json" 2>/dev/null
  python tools/devaug_aggregate.py > runs/devaug_agg.log 2>&1
}
run_devaug 1
run_devaug 2
echo "MASTER3_DONE $(date +%H:%M:%S)"
