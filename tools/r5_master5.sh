#!/bin/bash
# Round-5 master sequencer v5 — tail re-order to protect the critical path:
# after bench full (waited on via $1): AUTO roofline -> DEVAUG seed 1 ->
# battery 3 (dense-train attribution + int8 chip gate) -> DEVAUG seed 2.
# Rationale: devaug seed 1 is the last open VERDICT-#2 evidence item and takes
# ~85 min; battery 3 is nice-to-have and can absorb the end-of-session cut.
set -u
cd /root/repo
mkdir -p runs profiles

WAIT_PID=${1:-}
if [ -n "$WAIT_PID" ]; then
  echo "waiting for bench full (pid $WAIT_PID) ..."
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 20; done
fi
echo "v5 takes over $(date +%H:%M:%S)"

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
  python tools/devaug_aggregate.py --include-r03 > runs/devaug_agg.log 2>&1
}
run_devaug 1
bash tools/r5_battery3.sh >> runs/battery3.log 2>&1
run_devaug 2
echo "MASTER5_DONE $(date +%H:%M:%S)"
