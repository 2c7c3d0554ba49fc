#!/bin/bash
# Round-4 accuracy-evidence chain (VERDICT r3 missing #5 / next-round #4):
#   - mAP parity at the reference's 1280 eval protocol, 3 training seeds,
#     shared FIXED 200-image eval split (synth_aerial seed 31 inside
#     map_parity.py) -- per-seed deltas land in profiles/.
#   - then the pipelined-validate A/B (VERDICT #2) on the seed-0 converged
#     weights at the config #4 geometry (1280, b8, bf16).
# Chip-serial by construction: one TPU client at a time (axon relay).
set -u
cd /root/repo
run_seed() {
  s=$1
  echo "=== parity seed $s $(date +%H:%M:%S) ==="
  timeout 3600 python tools/map_parity.py --img-size 320 --eval-img-size 1280 \
    --epochs 600 --n-val 200 --seed "$s" --workdir "/tmp/parity_s$s" \
    > "/tmp/parity_s$s.log" 2>&1
  echo "seed $s exit $?"
  cp "/tmp/parity_s$s/parity.json" "profiles/parity_1280_r4_seed$s.json" 2>/dev/null
}
run_seed 0
# validate A/B right after seed 0 so the VERDICT #2 artifact lands even if the
# session ends mid-chain (seeds 1-2 extend the #4 evidence afterwards)
echo "=== validate A/B $(date +%H:%M:%S) ==="
# -d: orbax checkpoints are DIRECTORIES; plain ls -t lists their contents
# under a "path:" header line, which corrupted the weights path (round-4 bug).
W=$(ls -dt /tmp/parity_s0/run/weights/best /tmp/parity_s0/run/weights/last 2>/dev/null | head -1)
timeout 2400 python tools/validate_ab.py --weights "$W" \
  --data /tmp/parity_s0/data_eval/data.yaml --img-size 1280 --batch-size 8 \
  --out profiles/validate_ab_r4.json > /tmp/validate_ab.log 2>&1
echo "validate A/B exit $?"
run_seed 1
run_seed 2
python tools/parity_aggregate.py > /tmp/parity_agg.log 2>&1
echo "chain done $(date +%H:%M:%S)"
