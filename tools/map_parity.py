"""mAP parity proof: repaired reference (torch) vs skyeye_tpu, same weights.

The accuracy half of the north star (BASELINE.json: mAP@50 parity ±0.5pt) needs
side-by-side evidence, not per-tensor numerics (VERDICT.md #3). This driver:

  1. generates a synthetic VisDrone-style aerial val set (tools/synth_aerial.py
     — no real drone data is obtainable offline),
  2. trains skyeye_tpu at a reference-runnable geometry (the reference neck only
     works at width_multiple=1.0, SURVEY.md §8),
  3. reverse-exports the trained weights to a reference-layout torch state_dict
     and loads them into the REPAIRED reference model with strict key checking,
  4. runs the reference's own validate protocol (reference model + reference
     non_max_suppression + reference ap_per_class; tools/ref_harness.py) and
     skyeye_tpu.cli.validate on identical letterboxed batches,
  5. prints both mAP@50 / mAP@50:95 and the deltas.

Usage:
    python tools/map_parity.py --workdir /tmp/map_parity \
        --epochs 80 --img-size 512 --n-train 96 --n-val 48
"""
from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent))
sys.path.insert(0, str(Path(__file__).parent.parent))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--workdir", type=Path, default=Path("/tmp/map_parity"))
    p.add_argument("--epochs", type=int, default=80)
    p.add_argument("--img-size", type=int, default=512)
    p.add_argument("--n-train", type=int, default=96)
    p.add_argument("--n-val", type=int, default=48)
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--base-channels", type=int, default=16)
    p.add_argument("--skip-train", action="store_true",
                   help="reuse existing weights in workdir")
    p.add_argument("--cpu", action="store_true",
                   help="force the JAX side onto CPU (smoke runs)")
    p.add_argument("--variant", choices=("base", "enhanced"), default="base",
                   help="'enhanced' = EnhancedSkyEyeDetector parity: our enhanced "
                        "model in ref_exact cross-attention mode vs the repaired "
                        "reference (repairs R1-R3, tools/ref_harness.py)")
    p.add_argument("--seed", type=int, default=0,
                   help="TRAINING seed (init + shuffling + aug). The val split "
                        "stays fixed across seeds so a multi-seed sweep "
                        "isolates training-seed variance (VERDICT r3 #4).")
    p.add_argument("--eval-img-size", type=int, default=None,
                   help="evaluate BOTH stacks at this geometry instead of the "
                        "training --img-size (reference eval protocol is 1280, "
                        "README.md:69). Uses a separate val split generated at "
                        "this canvas size: synth_aerial object pixel sizes are "
                        "absolute, so a bigger canvas keeps the trained object "
                        "scale while exercising the flagship input geometry.")
    args = p.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    from ref_harness import build_repaired_model, ref_validate
    from synth_aerial import make_dataset

    from skyeye_tpu.config import ModelConfig
    from skyeye_tpu.data.dataset import create_dataloader

    workdir = args.workdir
    workdir.mkdir(parents=True, exist_ok=True)

    # -- dataset (square canvases: identical letterbox geometry on both sides) --
    data_yaml = workdir / "data" / "data.yaml"
    if not data_yaml.exists():
        print(f"generating synthetic aerial dataset under {workdir/'data'} ...")
        make_dataset(workdir / "data", n_train=args.n_train, n_val=args.n_val,
                     square=True, img_size=args.img_size)

    enhanced = args.variant == "enhanced"
    cfg = ModelConfig(nc=8, base_channels=args.base_channels,
                      depth_multiple=0.33, width_multiple=1.0,
                      enhanced=enhanced, ref_exact_cross_attn=enhanced)

    # -- train skyeye_tpu ------------------------------------------------------
    # prefer the most recent of best/last (noval runs only write last; a stale
    # best from an earlier aborted run must not shadow a fresh last)
    cands = [workdir / "run" / "weights" / n for n in ("best", "last")]
    cands = [c for c in cands if c.exists()]
    weights = max(cands, key=lambda c: c.stat().st_mtime) if cands else cands
    if not cands or not args.skip_train:
        from skyeye_tpu.cli.train import train

        # Overfit-friendly hyps: the parity proof needs a model with CONFIDENT
        # detections on its own val set, not generalization. Focal loss off
        # (the reference's hardcoded fl_gamma=1.5 slows obj-confidence growth at
        # this tiny step budget) and mosaic off (96 images is an overfit regime).
        import yaml as _yaml

        hyp_path = workdir / "hyp_parity.yaml"
        hyp_path.write_text(_yaml.safe_dump({
            "fl_gamma": 0.0, "mosaic": 0.0, "mixup": 0.0,
            "scale": 0.2, "translate": 0.05,
        }))

        t0 = time.time()
        _, save_dir = train(
            cfg=cfg, data=str(data_yaml), hyp=str(hyp_path), epochs=args.epochs,
            batch_size=args.batch_size, img_size=args.img_size, accumulate=1,
            project=str(workdir), name="run", exist_ok=True, workers=4,
            patience=10_000, max_labels=160, noval=True, seed=args.seed,
            save_period=100,  # orbax saves cost seconds; thin them under noval
        )
        wdir = Path(save_dir) / "weights"
        cands = [wdir / n for n in ("best", "last") if (wdir / n).exists()]
        weights = max(cands, key=lambda c: c.stat().st_mtime)
        print(f"training done in {time.time()-t0:.0f}s -> {weights}")

    # -- reverse-export to torch, strict-load into the repaired reference ------
    import torch

    from skyeye_tpu.cli.export import export_torch
    from skyeye_tpu.utils.checkpoint import load_model

    module, variables, _ = load_model(str(weights), fuse=False)
    pt_path = workdir / "converted.pt"
    export_torch(module, variables, pt_path)
    sd = torch.load(pt_path, map_location="cpu", weights_only=False)["state_dict"]

    # anchors: the reference decode computes anchor_grid = anchors * stride
    # (reference detector.py:118-121), i.e. it expects GRID-UNIT anchors — its
    # hardcoded pixel-unit default (detector.py:39-43) double-scales (a §8-class
    # bug). Passing our stride-normalized anchors gives both models identical,
    # correct decode semantics.
    ref_cfg = {"nc": cfg.nc, "base_channels": cfg.base_channels,
               "depth_multiple": cfg.depth_multiple,
               "width_multiple": cfg.width_multiple,
               "anchors": [[list(a) for a in level] for level in cfg.anchors]}
    ref_model = build_repaired_model(ref_cfg, enhanced=enhanced)
    missing, unexpected = ref_model.load_state_dict(sd, strict=False)
    # num_batches_tracked buffers are absent from the flax side by design
    real_missing = [k for k in missing if "num_batches_tracked" not in k]
    print(f"state_dict: {len(sd)} tensors, missing={len(real_missing)}, "
          f"unexpected={len(unexpected)}")
    if real_missing or unexpected:
        print("  missing:", real_missing[:10])
        print("  unexpected:", unexpected[:10])
        raise SystemExit("reverse export does not cover the reference model")

    # -- sanity: decoded outputs match on one batch ----------------------------
    import jax
    import jax.numpy as jnp

    from skyeye_tpu.models.head import decode_predictions

    loader, _ = create_dataloader(
        str(workdir / "data" / "images" / "val"), img_size=args.img_size,
        batch_size=args.batch_size, stride=32, augment=False, rect=False,
        shuffle=False, workers=4, max_labels=64,
    )
    batch0 = next(iter(loader))
    x = batch0["images"].astype(np.float32) / 255.0
    with torch.no_grad():
        dec_t, _ = ref_model(torch.from_numpy(
            np.ascontiguousarray(x.transpose(0, 3, 1, 2))))
    # highest precision: on TPU the default conv path multiplies in bf16, which
    # is fine for mAP but would make this float32-vs-float32 sanity diff noisy
    with jax.default_matmul_precision("highest"):
        outs = module.apply(variables, jnp.asarray(x), train=False)
        dec_j = decode_predictions(outs, jnp.asarray(cfg.anchors),
                                   (args.img_size, args.img_size))
    diff = float(np.abs(np.asarray(dec_j) - dec_t.numpy()).max())
    print(f"decoded-output max|Δ| on one val batch: {diff:.2e}")

    # -- eval geometry: optionally decoupled from the training size ------------
    eval_img = args.eval_img_size or args.img_size
    eval_yaml, eval_loader = data_yaml, loader
    if eval_img != args.img_size:
        eval_yaml = workdir / "data_eval" / "data.yaml"
        if not eval_yaml.exists():
            print(f"generating {eval_img}px eval val split under "
                  f"{workdir/'data_eval'} ...")
            make_dataset(workdir / "data_eval", n_train=2, n_val=args.n_val,
                         square=True, img_size=eval_img, seed=31)
        eval_loader, _ = create_dataloader(
            str(workdir / "data_eval" / "images" / "val"), img_size=eval_img,
            batch_size=args.batch_size, stride=32, augment=False, rect=False,
            shuffle=False, workers=4, max_labels=160,
        )

    # -- torch side: reference validate protocol -------------------------------
    t0 = time.time()
    mp_t, mr_t, map50_t, map_t = ref_validate(ref_model, eval_loader, nc=cfg.nc)
    t_torch = time.time() - t0
    print(f"reference(torch,repaired): P {mp_t:.4f} R {mr_t:.4f} "
          f"mAP50 {map50_t:.4f} mAP50-95 {map_t:.4f}  ({t_torch:.0f}s)")

    # -- jax side: skyeye_tpu validate -----------------------------------------
    from skyeye_tpu.cli.validate import validate

    results, _, _ = validate(
        data=str(eval_yaml), weights=str(weights),
        batch_size=args.batch_size, img_size=eval_img,
        project=str(workdir), name="val_jax", exist_ok=True, plots=False,
    )
    mp_j, mr_j, map50_j, map_j = results[:4]
    print(f"skyeye_tpu:                P {mp_j:.4f} R {mr_j:.4f} "
          f"mAP50 {map50_j:.4f} mAP50-95 {map_j:.4f}")

    d50 = abs(map50_j - map50_t)
    d95 = abs(map_j - map_t)
    verdict = "PASS" if d50 <= 0.005 else "FAIL"
    print(f"Δ mAP50 {d50*100:.2f}pt  Δ mAP50-95 {d95*100:.2f}pt  "
          f"[{verdict}: target ≤0.5pt]")
    (workdir / "parity.json").write_text(json.dumps({
        "map50_ref_torch": round(float(map50_t), 5),
        "map50_skyeye_tpu": round(float(map50_j), 5),
        "map5095_ref_torch": round(float(map_t), 5),
        "map5095_skyeye_tpu": round(float(map_j), 5),
        "delta_map50_pt": round(float(d50) * 100, 3),
        "delta_map5095_pt": round(float(d95) * 100, 3),
        "decoded_max_abs_diff": diff,
        "img_size": args.img_size, "eval_img_size": eval_img,
        "n_val": args.n_val, "epochs": args.epochs, "seed": args.seed,
        "variant": args.variant, "verdict": verdict,
    }, indent=1))
    print(f"wrote {workdir/'parity.json'}")


if __name__ == "__main__":
    main()
