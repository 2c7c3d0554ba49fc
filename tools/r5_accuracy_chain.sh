#!/bin/bash
# Round-5 accuracy-evidence chain (VERDICT r4 #2):
#   - parity seeds 1 and 2 at the 200-image 1280 protocol (seed 0 PASSed in
#     round 4: delta 0.106 pt) -> completes the 3-seed protocol -> aggregate
#     into PARITY_1280_r05.json.
#   - DEVAUG 2-seed repeat (seeds 1, 2; round-3's +1.21 pt was seed 0) at the
#     600-epoch overfit recipe -> DEVAUG_r05.json.
# /tmp-wipe-proof: every workdir lives under /root/repo/runs/ (repo disk
# persists across driver sessions); artifacts copied into profiles/ as each
# stage lands. Chip-serial by construction (one axon TPU client at a time).
set -u
cd /root/repo
mkdir -p runs profiles

run_seed() {
  s=$1
  echo "=== parity seed $s $(date +%H:%M:%S) ==="
  timeout 4500 python tools/map_parity.py --img-size 320 --eval-img-size 1280 \
    --epochs 600 --n-val 200 --seed "$s" --workdir "runs/parity_s$s" \
    > "runs/parity_s$s.log" 2>&1
  echo "seed $s exit $?"
  cp "runs/parity_s$s/parity.json" "profiles/parity_1280_r4_seed$s.json" 2>/dev/null
  # aggregate after EVERY seed so a partial chain still leaves a current file
  python tools/parity_aggregate.py --out PARITY_1280_r05.json \
    > runs/parity_agg.log 2>&1
}
run_seed 1
run_seed 2

run_devaug() {
  s=$1
  echo "=== devaug seed $s $(date +%H:%M:%S) ==="
  timeout 7200 python tools/device_aug_demo.py --overfit --epochs 600 \
    --seed "$s" --workdir "runs/devaug_s$s" \
    > "runs/devaug_s$s.log" 2>&1
  echo "devaug seed $s exit $?"
  cp "runs/devaug_s$s/device_aug_demo.json" "profiles/devaug_r5_seed$s.json" 2>/dev/null
}
run_devaug 1
run_devaug 2
echo "CHAIN_DONE $(date +%H:%M:%S)"
