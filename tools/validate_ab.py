"""Pipelined-vs-synchronous validate A/B on identical weights.

VERDICT r3 #2's gate: the pipelined eval loop must reproduce the synchronous
loop's mAP bit-identically while cutting ms/img. This drives
`skyeye_tpu.cli.validate` twice on the same weights + val split —
pipeline_depth=1 (synchronous: zero launches in flight, the round-3 behavior)
vs the shipped default — and reports both speed lines plus the mAP deltas.

Reference protocol being matched: /root/reference/skyeye/cli/validate.py:322-326
(speed line), README.md:69 (eval at img-size 1280).

Usage:
  python tools/validate_ab.py --weights <ckpt> --data <data.yaml> \
      [--img-size 1280] [--batch-size 8] [--out profiles/validate_ab.json]
"""
from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--weights", required=True)
    p.add_argument("--data", required=True)
    p.add_argument("--img-size", type=int, default=1280)
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--half", action="store_true", default=True)
    p.add_argument("--depth", type=int, default=3)
    p.add_argument("--paced", action="store_true",
                   help="paced-ingest mode (VERDICT r4 #3): stage val batches "
                        "HBM-resident and release them at a PCIe-class budget "
                        "(bytes/12GBps), so the A/B measures the eval loop "
                        "instead of this environment's ~30 MB/s relay H2D; a "
                        "warmup pass pays every XLA compile so BOTH timed arms "
                        "run warm")
    p.add_argument("--out", type=Path, default=Path("profiles/validate_ab.json"))
    args = p.parse_args()

    from skyeye_tpu.cli.validate import validate
    from skyeye_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    paced_ms = None
    if args.paced:
        # PCIe-class ingest budget for this geometry (uint8 HWC frames)
        paced_ms = args.batch_size * args.img_size**2 * 3 / 12e9 * 1e3
    rec = {"img_size": args.img_size, "batch_size": args.batch_size,
           "weights": str(args.weights), "paced_ingest_ms_per_batch":
           round(paced_ms, 3) if paced_ms else None}
    arms = [("sync", 1), ("pipelined", args.depth)]
    if args.paced:  # warmup arm pays the XLA compiles; discarded
        arms.insert(0, ("warmup", args.depth))
    for tag, depth in arms:
        t0 = time.time()
        results, _, (pre_ms, inf_ms, wall_ips) = validate(
            data=args.data, weights=args.weights, batch_size=args.batch_size,
            img_size=args.img_size, half=args.half, plots=False,
            project="/tmp/validate_ab", name=tag, exist_ok=True,
            pipeline_depth=depth, paced_ingest_ms=paced_ms,
        )
        if tag == "warmup":
            print(f"[warmup] compiles paid ({time.time() - t0:.0f}s)")
            continue
        rec[tag] = {
            "pipeline_depth": depth,
            "mp": round(float(results[0]), 6), "mr": round(float(results[1]), 6),
            "map50": round(float(results[2]), 6),
            "map5095": round(float(results[3]), 6),
            "pre_ms_per_img": round(float(pre_ms), 2),
            "inference_nms_ms_per_img": round(float(inf_ms), 2),
            "eval_wall_img_per_s": round(float(wall_ips), 2),
            "total_wall_s": round(time.time() - t0, 1),
        }
        print(f"[{tag} depth={depth}] mAP50 {results[2]:.6f} "
              f"mAP50-95 {results[3]:.6f}  pre {pre_ms:.1f} ms/img  "
              f"inf+NMS {inf_ms:.1f} ms/img")

    rec["map50_bit_identical"] = rec["sync"]["map50"] == rec["pipelined"]["map50"]
    rec["map5095_bit_identical"] = (
        rec["sync"]["map5095"] == rec["pipelined"]["map5095"])
    print(f"mAP bit-identical: {rec['map50_bit_identical']} / "
          f"{rec['map5095_bit_identical']}")
    args.out.parent.mkdir(parents=True, exist_ok=True)
    args.out.write_text(json.dumps(rec, indent=1))
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
