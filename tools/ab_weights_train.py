"""Train throwaway weights for the pipelined-validate A/B (VERDICT r3 #2).

tools/map_parity.py does this as a side effect but then spends ~20 min
training/evaluating the repaired torch reference — irrelevant for the A/B,
which only needs (a) converged-enough weights so the eval-NMS sees realistic
box counts and (b) the FIXED 200-image 1280px eval split (synth_aerial
seed 31, same split the parity runs use). This driver produces exactly those
two artifacts: same model config, hyp overrides, and training protocol as
map_parity (tools/map_parity.py:86-120), nothing else.

Usage: python tools/ab_weights_train.py --workdir /tmp/ab_weights --epochs 220
"""
import argparse
import sys
from pathlib import Path

import yaml

# runnable as `python tools/ab_weights_train.py` from the repo root: repo on
# sys.path for skyeye_tpu, this dir for synth_aerial
sys.path.insert(0, str(Path(__file__).parent.parent))
sys.path.insert(0, str(Path(__file__).parent))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--workdir", type=Path, default=Path("/tmp/ab_weights"))
    p.add_argument("--epochs", type=int, default=220)
    p.add_argument("--img-size", type=int, default=320)
    p.add_argument("--eval-img-size", type=int, default=1280)
    p.add_argument("--n-val", type=int, default=200)
    p.add_argument("--seed", type=int, default=7)
    args = p.parse_args()

    from synth_aerial import make_dataset

    from skyeye_tpu.config import ModelConfig

    workdir = args.workdir
    workdir.mkdir(parents=True, exist_ok=True)

    data_yaml = workdir / "data" / "data.yaml"
    if not data_yaml.exists():
        make_dataset(workdir / "data", n_train=96, n_val=8, square=True,
                     img_size=args.img_size)
    eval_yaml = workdir / "data_eval" / "data.yaml"
    if not eval_yaml.exists():
        # seed 31 = the fixed eval split every round-4 parity run scores on
        make_dataset(workdir / "data_eval", n_train=2, n_val=args.n_val,
                     square=True, img_size=args.eval_img_size, seed=31)

    cfg = ModelConfig(nc=8, base_channels=16, depth_multiple=0.33,
                      width_multiple=1.0)
    hyp_path = workdir / "hyp_parity.yaml"
    hyp_path.write_text(yaml.safe_dump({
        "fl_gamma": 0.0, "mosaic": 0.0, "mixup": 0.0,
        "scale": 0.2, "translate": 0.05,
    }))

    from skyeye_tpu.cli.train import train

    _, save_dir = train(
        cfg=cfg, data=str(data_yaml), hyp=str(hyp_path), epochs=args.epochs,
        batch_size=8, img_size=args.img_size, accumulate=1,
        project=str(workdir), name="run", exist_ok=True, workers=4,
        patience=10_000, max_labels=160, noval=True, seed=args.seed,
        save_period=100,
    )
    wdir = Path(save_dir) / "weights"
    cands = [wdir / n for n in ("best", "last") if (wdir / n).exists()]
    if not cands:
        sys.exit(f"no checkpoint under {wdir} (train aborted before first save?)")
    weights = max(cands, key=lambda c: c.stat().st_mtime)
    print(f"weights -> {weights}")
    print(f"eval yaml -> {eval_yaml}")


if __name__ == "__main__":
    main()
