#!/bin/bash
# Round-5 master sequencer v4 — replaces v3 (killed between stages so a fresh
# AUTO-layout roofline could be inserted before the DEVAUG marathon; v3's
# stage 1 — bench train640 exact — keeps running and is waited on via $1).
# Queue: train640-dense A/B -> ab_weights -> paced validate A/B -> bench full
#        -> AUTO roofline + attrib (the VERDICT-#1 floor-proof under the
#        SHIPPED input layout; r4's table was profiled without AUTO)
#        -> devaug seed 1 -> devaug seed 2.
set -u
cd /root/repo
mkdir -p runs profiles

WAIT_PID=${1:-}
if [ -n "$WAIT_PID" ]; then
  echo "waiting for stage-1 bench (pid $WAIT_PID) ..."
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 20; done
fi
echo "v4 takes over $(date +%H:%M:%S)"

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

echo "=== AUTO-layout roofline @1280 b16 $(date +%H:%M:%S) ==="
timeout 2400 python tools/profile_bench.py --auto-layout --img 1280 --batch 16 \
  --trace-dir profiles/r5_1280_auto > profiles/r5_1280_auto.log 2>&1
echo "profile exit $?"
timeout 600 python tools/roofline_attrib.py --dir profiles/r5_1280_auto \
  --out profiles/r5_1280_auto/roofline_attrib.json \
  > profiles/r5_1280_auto_attrib.log 2>&1
echo "attrib exit $?"

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
echo "MASTER4_DONE $(date +%H:%M:%S)"
