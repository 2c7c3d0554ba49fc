#!/bin/bash
# Round-5 master sequencer (replaces the tail of r5_accuracy_chain.sh, whose
# shell was stopped after parity seed 2 started so the SERVING batteries run
# before the ~2.7 h devaug stages — headline results must land early enough
# to react within the session).
# Order: finish seed 2 -> aggregate -> battery 1 (serving A/Bs, int8 gate,
# train640, paced validate A/B, bench) -> battery 2 (dense-loss train A/B) ->
# devaug seeds 1-2 -> devaug aggregate. Chip-serial throughout.
set -u
cd /root/repo

SEED2_PID=${1:-28970}
echo "waiting for parity seed 2 (pid $SEED2_PID) ..."
while kill -0 "$SEED2_PID" 2>/dev/null; do sleep 30; done
echo "seed 2 done $(date +%H:%M:%S)"
cp runs/parity_s2/parity.json profiles/parity_1280_r4_seed2.json 2>/dev/null
python tools/parity_aggregate.py --out PARITY_1280_r05.json \
  > runs/parity_agg.log 2>&1
echo "parity aggregate exit $?"

# the batteries' own chain-waits read these pid files; clear them so each
# battery starts immediately when invoked here
rm -f /tmp/r5_chain.pid /tmp/r5_battery1.pid

bash tools/r5_battery1.sh
echo $$ > /tmp/r5_battery1.pid  # battery2's wait sees a dead pid -> skips
rm -f /tmp/r5_battery1.pid
bash tools/r5_battery2.sh

run_devaug() {
  s=$1
  echo "=== devaug seed $s $(date +%H:%M:%S) ==="
  timeout 7200 python tools/device_aug_demo.py --overfit --epochs 600 \
    --seed "$s" --workdir "runs/devaug_s$s" \
    > "runs/devaug_s$s.log" 2>&1
  echo "devaug seed $s exit $?"
  cp "runs/devaug_s$s/device_aug_demo.json" "profiles/devaug_r5_seed$s.json" 2>/dev/null
  python tools/devaug_aggregate.py > runs/devaug_agg.log 2>&1
}
run_devaug 1
run_devaug 2
echo "MASTER_DONE $(date +%H:%M:%S)"
