"""On-chip approx_max_k accuracy impact (round-2 VERDICT #4).

Serving paths default to jax.lax.approx_max_k for the pre-NMS candidate cut
(~95% candidate recall of the exact sort, but 38% pipeline-time cheaper). This
tool quantifies what that costs in mAP where it matters: validate a CONVERGED
model twice on the same val set — exact top-k vs approx_max_k — at both eval
thresholds (conf 0.001, the mAP protocol) and serving thresholds (conf 0.25).

The serving default stays approx only if the serving-threshold delta is
<= 0.2 pt mAP50 (gate recorded in BASELINE.md).

Usage (after a converged run, e.g. tools/device_aug_demo.py --overfit):
    python tools/approx_topk_eval.py --weights /tmp/devaug/host_aug/weights/best \
        --data /tmp/devaug/data/data.yaml --img-size 320 \
        --out profiles/approx_topk_r03.json
"""
from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--weights", required=True)
    p.add_argument("--data", required=True)
    p.add_argument("--img-size", type=int, default=320)
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--out", default="profiles/approx_topk_r03.json")
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    import jax

    from skyeye_tpu.cli.validate import validate
    from skyeye_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    results = {"platform": jax.devices()[0].platform, "weights": args.weights,
               "runs": {}}
    for label, conf in [("eval_conf0.001", 0.001), ("serving_conf0.25", 0.25)]:
        for mode, approx in [("exact", False), ("approx", True)]:
            r, _, _ = validate(
                data=args.data, weights=args.weights,
                batch_size=args.batch_size, img_size=args.img_size,
                conf_thres=conf, project="/tmp/approx_eval", name=f"{label}_{mode}",
                exist_ok=True, plots=False, approx_topk=approx,
            )
            results["runs"][f"{label}_{mode}"] = {
                "precision": round(float(r[0]), 4), "recall": round(float(r[1]), 4),
                "map50": round(float(r[2]), 4), "map5095": round(float(r[3]), 4),
            }
            print(f"{label} {mode}: mAP50 {r[2]:.4f} mAP50-95 {r[3]:.4f}")

    for label in ("eval_conf0.001", "serving_conf0.25"):
        d50 = (results["runs"][f"{label}_exact"]["map50"]
               - results["runs"][f"{label}_approx"]["map50"])
        results[f"delta_map50_pt_{label}"] = round(d50 * 100, 3)
        print(f"{label}: exact-approx mAP50 delta = {d50*100:.3f} pt")
    results["serving_gate_0.2pt"] = (
        abs(results["delta_map50_pt_serving_conf0.25"]) <= 0.2)

    out = Path(args.out)
    out.parent.mkdir(parents=True, exist_ok=True)
    out.write_text(json.dumps(results, indent=1))
    print(f"wrote {out}; serving gate (<=0.2pt): "
          f"{'PASS' if results['serving_gate_0.2pt'] else 'FAIL'}")


if __name__ == "__main__":
    main()
