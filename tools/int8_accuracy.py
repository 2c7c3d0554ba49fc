"""Int8 early-backbone accuracy check on a converged model.

Pipeline: load trained weights -> fold BN + pack stem (the bf16 serving form)
-> calibrate activation ranges on train images -> quantize stages 1-2 ->
validate BOTH serving forms on the same val set and report the mAP delta.

This is the accuracy half of the int8 serving mode (speed half:
tools/quant_stage_bench.py, 1.27x on the early stage). Gate: the int8 mode is
recommended for serving only if the mAP50 delta is <= 0.5pt on a converged
model (recorded in BASELINE.md).

Usage:
    python tools/int8_accuracy.py --weights /tmp/devaug_r3/host_aug/weights/last \
        --data /tmp/devaug_r3/data/data.yaml --img-size 320 \
        --out profiles/int8_accuracy_r03.json
"""
from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--weights", required=True)
    p.add_argument("--data", required=True)
    p.add_argument("--img-size", type=int, default=320)
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--calib-batches", type=int, default=4)
    p.add_argument("--out", default="profiles/int8_accuracy_r03.json")
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from skyeye_tpu.cli.validate import validate
    from skyeye_tpu.data.dataset import create_dataloader
    from skyeye_tpu.models import SkyEyeDetectorModule
    from skyeye_tpu.ops.calibrate import observe_ranges
    from skyeye_tpu.ops.int8_stage import quantize_early_variables
    from skyeye_tpu.ops.packed_stem import pack_stem_variables, s2d4_host
    from skyeye_tpu.utils.cache import enable_compilation_cache
    from skyeye_tpu.utils.checkpoint import fuse_conv_bn, load_model
    from skyeye_tpu.utils.general import check_dataset

    enable_compilation_cache()
    module, variables, config = load_model(args.weights, fuse=True)
    packed_vars = pack_stem_variables(variables)
    packed = SkyEyeDetectorModule(config=config, packed_stem=True,
                                  dtype=module.dtype)

    # calibration on train images (packed layout, [0,1])
    data_cfg = check_dataset(args.data)
    loader, _ = create_dataloader(
        data_cfg.train, img_size=args.img_size, batch_size=args.batch_size,
        stride=int(max(config.strides)), augment=False, shuffle=False, workers=2,
    )
    batches = []
    for i, b in enumerate(loader):
        if i >= args.calib_batches:
            break
        batches.append(s2d4_host(np.asarray(b["images"])).astype(np.float32) / 255.0)
    ranges = observe_ranges(packed, packed_vars, batches)
    qv = quantize_early_variables(packed_vars, ranges, config)
    int8_mod = SkyEyeDetectorModule(config=config, packed_stem=True,
                                    int8_early=True, dtype=module.dtype)

    results = {"weights": args.weights, "platform": jax.devices()[0].platform,
               "runs": {}}
    for label, (mod, vv) in [
        ("bf16", (packed, packed_vars)),
        ("int8_early", (int8_mod, qv)),
    ]:
        # validate consumes (module, variables, config) and letterboxes on host;
        # the packed modules take packed input, so route through a wrapper that
        # packs on device (s2d4_device happens inside the module for 3ch input)
        r, _, _ = validate(
            data=args.data, batch_size=args.batch_size, img_size=args.img_size,
            model=(mod, vv, config), project="/tmp/int8_eval", name=label,
            exist_ok=True, plots=False, save_dir=Path("/tmp/int8_eval") / label,
        )
        results["runs"][label] = {
            "precision": round(float(r[0]), 4), "recall": round(float(r[1]), 4),
            "map50": round(float(r[2]), 4), "map5095": round(float(r[3]), 4),
        }
        print(f"{label}: mAP50 {r[2]:.4f} mAP50-95 {r[3]:.4f}")

    d = results["runs"]["bf16"]["map50"] - results["runs"]["int8_early"]["map50"]
    results["delta_map50_pt"] = round(d * 100, 3)
    results["gate_0.5pt"] = abs(results["delta_map50_pt"]) <= 0.5
    out = Path(args.out)
    out.parent.mkdir(parents=True, exist_ok=True)
    out.write_text(json.dumps(results, indent=1))
    print(f"int8 mAP50 delta: {d*100:.3f} pt "
          f"({'PASS' if results['gate_0.5pt'] else 'FAIL'} 0.5pt gate) -> {out}")


if __name__ == "__main__":
    main()
