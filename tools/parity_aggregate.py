"""Aggregate per-seed 1280-protocol parity runs into PARITY_1280_r04.json.

VERDICT r3 missing #5 / next-round #4: the flagship-geometry parity margin
(0.48 of the 0.5 pt gate) rested on ONE seed and a 48-image val set. The
round-4 protocol re-runs `tools/map_parity.py --img-size 320
--eval-img-size 1280 --epochs 600 --n-val 200` across 3 training seeds with a
FIXED 200-image eval split (synth seed 31), and this reports per-seed deltas +
mean/max so the PASS/FAIL is a distribution statement, not a point sample.

Usage: python tools/parity_aggregate.py [--glob 'profiles/parity_1280_r4_seed*.json']
"""
from __future__ import annotations

import argparse
import glob
import json
from pathlib import Path


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--glob", default="profiles/parity_1280_r4_seed*.json")
    ap.add_argument("--out", type=Path, default=Path("PARITY_1280_r04.json"))
    ap.add_argument("--note", default=None,
                    help="provenance note for an incomplete (<3 seed) run; "
                         "required context lives with the run, not hardcoded")
    args = ap.parse_args()

    seeds = []
    for f in sorted(glob.glob(args.glob)):
        rec = json.loads(Path(f).read_text())
        rec["file"] = f
        seeds.append(rec)
    if not seeds:
        raise SystemExit(f"no per-seed files match {args.glob}")

    d50 = [s["delta_map50_pt"] for s in seeds]
    d95 = [s["delta_map5095_pt"] for s in seeds]
    agg = {
        "protocol": ("train @320 600 epochs (per-seed), reverse-export to the "
                     "repaired reference, BOTH stacks evaluated @1280 on a "
                     "fixed 200-image synthetic val split (synth seed 31); "
                     "reference protocol README.md:69"),
        "n_seeds": len(seeds),
        "seeds": [s.get("seed") for s in seeds],
        "delta_map50_pt_per_seed": d50,
        "delta_map5095_pt_per_seed": d95,
        "delta_map50_pt_mean": round(sum(d50) / len(d50), 3),
        "delta_map50_pt_max": round(max(d50), 3),
        "delta_map5095_pt_mean": round(sum(d95) / len(d95), 3),
        "delta_map5095_pt_max": round(max(d95), 3),
        "n_val": seeds[0].get("n_val"),
        "eval_img_size": seeds[0].get("eval_img_size"),
        "per_seed": [{k: s.get(k) for k in
                      ("seed", "map50_ref_torch", "map50_skyeye_tpu",
                       "delta_map50_pt", "delta_map5095_pt", "verdict", "file")}
                     for s in seeds],
        # the gate is on the WORST seed: every seed must sit within 0.5 pt;
        # an incomplete run can at best be a partial pass (ADVICE r4)
        "protocol_complete": len(seeds) >= 3,
        "verdict": ("FAIL" if max(d50) > 0.5
                    else "PASS" if len(seeds) >= 3 else "PASS_PARTIAL"),
    }
    if len(seeds) < 3 or args.note:
        agg["note"] = args.note or (
            f"protocol plans 3 seeds; {len(seeds)} completed — remaining "
            "seeds queued (each costs ~55 min of chip-serial time)")
    args.out.write_text(json.dumps(agg, indent=1))
    print(json.dumps(agg, indent=1))
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
