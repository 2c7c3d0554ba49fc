"""Train + evaluate a skyeye_tpu model variant on the synthetic aerial set.

Capability evidence for variants with no runnable reference counterpart: the
transformer-heads variant (the reference defines TransformerLayer but never
assembles it into a model — SURVEY.md M11 "defined, unused" — so mAP parity
is impossible by construction; module-level tensor parity lives in
tests/test_torch_parity.py). This driver shows the variant trains end-to-end
to converged accuracy under the same protocol as the round-2/3 parity runs
and records its mAP next to the base model's.

Usage:
    python tools/variant_train_eval.py --workdir /tmp/var_transformer \
        --variant transformer --epochs 600 --img-size 320 \
        [--data /tmp/map_parity_enh/data/data.yaml]
"""
from __future__ import annotations

import argparse
import json
import time
from pathlib import Path
import sys

sys.path.insert(0, str(Path(__file__).parent))
sys.path.insert(0, str(Path(__file__).parent.parent))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--workdir", type=Path, required=True)
    p.add_argument("--variant", choices=("base", "enhanced", "transformer"),
                   default="transformer")
    p.add_argument("--data", default="",
                   help="existing data.yaml to reuse; generated if empty")
    p.add_argument("--epochs", type=int, default=600)
    p.add_argument("--img-size", type=int, default=320)
    p.add_argument("--n-train", type=int, default=96)
    p.add_argument("--n-val", type=int, default=48)
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--base-channels", type=int, default=16)
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    from skyeye_tpu.config import ModelConfig

    args.workdir.mkdir(parents=True, exist_ok=True)
    if args.data:
        data_yaml = Path(args.data)
    else:
        from synth_aerial import make_dataset

        data_yaml = args.workdir / "data" / "data.yaml"
        if not data_yaml.exists():
            make_dataset(args.workdir / "data", n_train=args.n_train,
                         n_val=args.n_val, square=True, img_size=args.img_size)

    cfg = ModelConfig(
        nc=8, base_channels=args.base_channels, depth_multiple=0.33,
        width_multiple=1.0,
        enhanced=args.variant == "enhanced",
        transformer_heads=args.variant == "transformer",
    )

    import yaml as _yaml

    hyp_path = args.workdir / "hyp_parity.yaml"
    hyp_path.write_text(_yaml.safe_dump({
        "fl_gamma": 0.0, "mosaic": 0.0, "mixup": 0.0,
        "scale": 0.2, "translate": 0.05,
    }))

    from skyeye_tpu.cli.train import train

    t0 = time.time()
    _, save_dir = train(
        cfg=cfg, data=str(data_yaml), hyp=str(hyp_path), epochs=args.epochs,
        batch_size=args.batch_size, img_size=args.img_size, accumulate=1,
        project=str(args.workdir), name="run", exist_ok=True, workers=4,
        patience=10_000, max_labels=160, noval=True, save_period=100,
    )
    wdir = Path(save_dir) / "weights"
    cands = [wdir / n for n in ("best", "last") if (wdir / n).exists()]
    weights = max(cands, key=lambda c: c.stat().st_mtime)
    train_s = time.time() - t0
    print(f"training done in {train_s:.0f}s -> {weights}")

    from skyeye_tpu.cli.validate import validate

    results, _, _ = validate(
        data=str(data_yaml), weights=str(weights),
        batch_size=args.batch_size, img_size=args.img_size,
        project=str(args.workdir), name="val", exist_ok=True, plots=False,
    )
    mp, mr, map50, map5095 = results[:4]
    out = {
        "variant": args.variant, "epochs": args.epochs,
        "img_size": args.img_size, "n_val": args.n_val,
        "precision": round(float(mp), 5), "recall": round(float(mr), 5),
        "map50": round(float(map50), 5), "map50_95": round(float(map5095), 5),
        "train_seconds": round(train_s),
    }
    (args.workdir / "result.json").write_text(json.dumps(out, indent=1))
    print(json.dumps(out))


if __name__ == "__main__":
    main()
