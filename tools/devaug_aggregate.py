"""Aggregate per-seed device-aug A/B runs into DEVAUG_r05.json.

VERDICT r4 #2: round 3's "+1.21 pt device-aug ahead" (DEVAUG_r03.json) was a
single seed — this folds the round-5 2-seed repeat (tools/r5_accuracy_chain.sh
runs seeds 1-2 of tools/device_aug_demo.py --overfit) plus the round-3 seed-0
artifact into a per-seed table with the gate evaluated on the WORST seed:
either device-aug stays ahead across seeds, or |delta| <= 0.5 pt.

Usage: python tools/devaug_aggregate.py \
          [--glob 'profiles/devaug_r5_seed*.json'] [--include-r03]
"""
from __future__ import annotations

import argparse
import glob
import json
from pathlib import Path


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--glob", default="profiles/devaug_r5_seed*.json")
    ap.add_argument("--include-r03", action="store_true", default=True,
                    help="fold in round 3's seed-0 artifact (same protocol)")
    ap.add_argument("--out", type=Path, default=Path("DEVAUG_r05.json"))
    args = ap.parse_args()

    seeds = []
    if args.include_r03 and Path("DEVAUG_r03.json").exists():
        rec = json.loads(Path("DEVAUG_r03.json").read_text())
        rec.setdefault("seed", 0)
        rec["file"] = "DEVAUG_r03.json"
        seeds.append(rec)
    for f in sorted(glob.glob(args.glob)):
        rec = json.loads(Path(f).read_text())
        rec["file"] = f
        seeds.append(rec)
    if not seeds:
        raise SystemExit(f"no per-seed files match {args.glob}")

    deltas = [s["delta_map50_pt"] for s in seeds]
    worst = min(deltas)  # positive = device-aug ahead
    agg = {
        "protocol": seeds[-1].get("protocol"),
        "n_seeds": len(seeds),
        "seeds": [s.get("seed") for s in seeds],
        "delta_map50_pt_per_seed": deltas,
        "delta_map50_pt_mean": round(sum(deltas) / len(deltas), 3),
        "delta_map50_pt_worst": round(worst, 3),
        "per_seed": [{k: s.get(k) for k in
                      ("seed", "host_aug", "device_aug", "delta_map50_pt",
                       "file")} for s in seeds],
        "protocol_complete": len(seeds) >= 3,
        # gate: device-aug ahead on every seed, or within 0.5 pt of host aug
        "verdict": ("PASS" if worst >= -0.5 else "FAIL"),
        "device_aug_ahead_all_seeds": all(d > 0 for d in deltas),
    }
    if len(seeds) < 3:
        agg["note"] = (f"{len(seeds)} of 3 protocol seeds complete; each costs "
                       "~2x ~40 min of chip-serial train time")
    args.out.write_text(json.dumps(agg, indent=1))
    print(json.dumps(agg, indent=1))
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
