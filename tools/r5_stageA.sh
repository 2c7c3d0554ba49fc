#!/bin/bash
# Round-5 stage A (manual sequencing after the relay-wedge episodes):
# seed-2 parity eval-only -> train640 exact -> train640 dense-loss A/B.
set -u
cd /root/repo

echo "=== parity seed 2 eval-only $(date +%H:%M:%S) ==="
timeout 3000 python tools/map_parity.py --img-size 320 --eval-img-size 1280 \
  --epochs 600 --n-val 200 --seed 2 --workdir runs/parity_s2 --skip-train \
  >> runs/parity_s2.log 2>&1
echo "seed 2 eval exit $?"
cp runs/parity_s2/parity.json profiles/parity_1280_r4_seed2.json 2>/dev/null
python tools/parity_aggregate.py --out PARITY_1280_r05.json \
  > runs/parity_agg.log 2>&1
echo "parity aggregate exit $?"

echo "=== bench train640 exact (dense-remap re-measure) $(date +%H:%M:%S) ==="
SKYEYE_TRAIN640_BF16_ONLY=1 timeout 2400 python bench.py --config train640 \
  > profiles/bench_train640_r5.json 2> profiles/bench_train640_r5.log
echo "train640 exact exit $?"

echo "=== bench train640 DENSE loss $(date +%H:%M:%S) ==="
SKYEYE_DENSE_LOSS=1 SKYEYE_TRAIN640_BF16_ONLY=1 timeout 2400 python bench.py \
  --config train640 \
  > profiles/bench_train640_dense_r5.json 2> profiles/bench_train640_dense_r5.log
echo "train640 dense exit $?"
echo "STAGEA_DONE $(date +%H:%M:%S)"
