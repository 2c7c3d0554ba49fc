#!/bin/bash
# Round-5 DEVAUG runner — seeds 1-2 of the 2-seed repeat (r3 = seed 0).
# Launched after battery 3; each seed trains host-aug AND device-aug to the
# 600-epoch converged protocol (~85 min/seed on v5e through the relay).
set -u
cd /root/repo

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
run_devaug 2
echo "DEVAUG_DONE $(date +%H:%M:%S)"
