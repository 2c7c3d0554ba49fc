"""Int8 serving-mode accuracy gate: stem / neck / both, on converged weights.

VERDICT r4 #4: the int8-neck unit win (1.28x at neck-class shapes,
profiles/int8_deep_bench.json) and the int8-stem 2x-MXU path must stop being
speed-only results — this gates them on mAP at the serving geometry with REAL
calibrated activation scales (ops/calibrate.observe_ranges on train images),
against the bf16 serving model on the same val set.

Pipeline per mode:
  bf16      fuse BN -> pack stem                        (baseline serving form)
  int8neck  + quantize every FPN/PAN conv (ops/int8_neck.py), calibrated scales
  int8stem  + fold /255 into the stem -> quantize stem (ops/int8_stem.py;
            input path exact — uint8 frames ARE the quantized activation)
  int8both  stem + neck together

The stem modes consume [0, 255] inputs (the /255 is folded), while validate()
normalizes to [0, 1]; a rescale shim multiplies by 255 inside apply — with
half=False the f32 roundtrip is exact after Int8PackedStem's round().

Gate: each mode is recommended for serving only if its mAP50 delta vs bf16 is
<= 0.5 pt (the round-3 int8-early gate, BASELINE.md).

Usage:
    python tools/int8_serving_gate.py \
        --weights runs/parity_s1/run/weights/last \
        --calib-data runs/parity_s1/data/data.yaml \
        --data runs/parity_s1/data_eval/data.yaml --img-size 1280 \
        --out profiles/int8_serving_gate_r5.json
"""
from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import numpy as np


class _Rescale255:
    """validate() feeds [0, 1]; the folded-stem int8 modules eat [0, 255]."""

    def __init__(self, module):
        self._m = module

    def apply(self, variables, x, train=False):
        return self._m.apply(variables, x * 255.0, train=train)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--weights", required=True)
    p.add_argument("--calib-data", required=True,
                   help="data.yaml whose train split feeds calibration")
    p.add_argument("--data", required=True, help="data.yaml for the val eval")
    p.add_argument("--img-size", type=int, default=1280)
    p.add_argument("--calib-img-size", type=int, default=320,
                   help="calibration geometry (ranges are per-tensor scalars; "
                        "the train geometry's activation stats transfer)")
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--calib-batches", type=int, default=4)
    p.add_argument("--modes", default="bf16,int8neck,int8stem,int8both")
    p.add_argument("--out", default="profiles/int8_serving_gate_r5.json")
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from skyeye_tpu.cli.validate import validate
    from skyeye_tpu.data.dataset import create_dataloader
    from skyeye_tpu.models import SkyEyeDetectorModule
    from skyeye_tpu.ops.calibrate import observe_ranges
    from skyeye_tpu.ops.int8_neck import quantize_neck_variables
    from skyeye_tpu.ops.int8_stem import quantize_stem_variables
    from skyeye_tpu.ops.packed_stem import fold_input_scale, pack_stem_variables, s2d4_host
    from skyeye_tpu.utils.cache import enable_compilation_cache
    from skyeye_tpu.utils.checkpoint import fuse_conv_bn, load_model
    from skyeye_tpu.utils.general import check_dataset

    enable_compilation_cache()
    module, variables, config = load_model(args.weights, fuse=True)
    packed_vars = pack_stem_variables(variables)  # canonical neck preserved
    packed = SkyEyeDetectorModule(config=config, packed_stem=True,
                                  dtype=module.dtype)

    # calibration: packed layout, [0, 1] (the bf16 serving input domain)
    data_cfg = check_dataset(args.calib_data)
    loader, _ = create_dataloader(
        data_cfg.train, img_size=args.calib_img_size,
        batch_size=args.batch_size, stride=int(max(config.strides)),
        augment=False, shuffle=False, workers=2,
    )
    batches = []
    for i, b in enumerate(loader):
        if i >= args.calib_batches:
            break
        batches.append(s2d4_host(np.asarray(b["images"])).astype(np.float32) / 255.0)
    t0 = time.time()
    ranges = observe_ranges(packed, packed_vars, batches)
    print(f"calibrated {len(ranges)} tensors on {len(batches)} batches "
          f"({time.time() - t0:.0f}s)")

    def build(mode):
        if mode == "bf16":
            return packed, packed_vars
        vv = packed_vars
        kw = {}
        if "neck" in mode or mode == "int8both":
            vv = quantize_neck_variables(vv, ranges, config)
            kw["int8_neck"] = True
        if "stem" in mode or mode == "int8both":
            vv = quantize_stem_variables(fold_input_scale(vv))
            kw["int8_stem"] = True
        mod = SkyEyeDetectorModule(config=config, packed_stem=True,
                                   dtype=module.dtype, **kw)
        return (_Rescale255(mod) if kw.get("int8_stem") else mod), vv

    results = {"weights": args.weights, "img_size": args.img_size,
               "platform": jax.devices()[0].platform,
               "calib": {"batches": len(batches),
                         "img_size": args.calib_img_size}, "runs": {}}
    for mode in args.modes.split(","):
        mod, vv = build(mode)
        r, _, _ = validate(
            data=args.data, batch_size=args.batch_size, img_size=args.img_size,
            model=(mod, vv, config), project="/tmp/int8_gate", name=mode,
            exist_ok=True, plots=False, half=False,
            save_dir=Path("/tmp/int8_gate") / mode,
        )
        results["runs"][mode] = {
            "precision": round(float(r[0]), 4), "recall": round(float(r[1]), 4),
            "map50": round(float(r[2]), 5), "map5095": round(float(r[3]), 5),
        }
        print(f"{mode}: mAP50 {r[2]:.4f} mAP50-95 {r[3]:.4f}", flush=True)

    base = results["runs"].get("bf16")
    if base:
        for mode, run in results["runs"].items():
            if mode == "bf16":
                continue
            d = (base["map50"] - run["map50"]) * 100
            run["delta_map50_pt"] = round(d, 3)
            run["gate_0.5pt"] = abs(d) <= 0.5
            print(f"{mode}: delta {d:+.3f} pt "
                  f"({'PASS' if run['gate_0.5pt'] else 'FAIL'} 0.5pt gate)")
    out = Path(args.out)
    out.parent.mkdir(parents=True, exist_ok=True)
    out.write_text(json.dumps(results, indent=1))
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
