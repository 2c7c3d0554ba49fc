#!/bin/bash
# Round-5 master sequencer v2 (restart after the relay wedge: parity seed 2's
# timeout-kill mid-eval stalled executions for ~10 min and battery 1 was
# stopped before producing numbers).
#   1. battery 1 (serving A/Bs, int8 gate, train640, paced validate, bench)
#   2. parity seed 2 chip-side eval ONLY (--skip-train; weights + torch eval
#      already landed) -> completes the 3-seed protocol
#   3. battery 2 (dense-loss train640 A/B + fresh attribution)
#   4. devaug seeds 1-2 + aggregate
set -u
cd /root/repo

bash tools/r5_battery1.sh

echo "=== parity seed 2 eval-only $(date +%H:%M:%S) ==="
timeout 3000 python tools/map_parity.py --img-size 320 --eval-img-size 1280 \
  --epochs 600 --n-val 200 --seed 2 --workdir runs/parity_s2 --skip-train \
  >> runs/parity_s2.log 2>&1
echo "seed 2 eval exit $?"
cp runs/parity_s2/parity.json profiles/parity_1280_r4_seed2.json 2>/dev/null
python tools/parity_aggregate.py --out PARITY_1280_r05.json \
  > runs/parity_agg.log 2>&1
echo "parity aggregate exit $?"

rm -f /tmp/r5_battery1.pid
bash tools/r5_battery2.sh

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
echo "MASTER2_DONE $(date +%H:%M:%S)"
