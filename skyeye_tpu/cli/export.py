"""Export CLI: saved-model artifacts for deployment.

Capability parity: the reference ships `skyeye/cli/export.py` as a ZERO-BYTE stub
(SURVEY.md C4, §2.7#7) — the capability is declared by filename only. Implemented
here TPU-natively with three targets:
  * `stablehlo` — jax.export serialized StableHLO bytes (portable compiled artifact)
  * `orbax`     — checkpoint directory (params + batch_stats + config)
  * `torch`     — reverse-converted torch state_dict .pt (interop with the
                  reference ecosystem; inverse of utils/checkpoint.py name mapping)

Usage: python -m skyeye_tpu.cli.export --weights runs/train/exp/weights/best \
           --formats stablehlo orbax --img-size 640
"""
from __future__ import annotations

import argparse
from pathlib import Path
from typing import List, Optional

import numpy as np

from ..utils.general import LOGGER


def export_stablehlo(module, variables, img_size: int, batch: int, out: Path,
                     dtype=None) -> Path:
    import jax
    import jax.numpy as jnp
    from jax import export as jexport

    def fwd(x):
        outs = module.apply(variables, x, train=False)
        from ..models.head import decode_predictions

        return decode_predictions(outs, jnp.asarray(module.config.anchors),
                                  (img_size, img_size))

    x = jnp.zeros((batch, img_size, img_size, 3), dtype or jnp.float32)
    exported = jexport.export(jax.jit(fwd))(
        jax.ShapeDtypeStruct(x.shape, x.dtype)
    )
    blob = exported.serialize()
    out.write_bytes(blob)
    LOGGER.info("StableHLO export: %s (%.1f KB)", out, len(blob) / 1024)
    return out


def export_orbax(module, variables, out: Path) -> Path:
    from ..utils.checkpoint import save_checkpoint

    save_checkpoint(out, {
        "params": variables["params"],
        "batch_stats": variables.get("batch_stats", {}),
        "config": module.config.to_dict(),
    })
    LOGGER.info("orbax export: %s", out)
    return out


def _flax_to_torch_key(path: List[str]) -> Optional[str]:
    """Inverse of the converter name mapping (utils/checkpoint.py) for core models."""
    import re

    joined = "/".join(path)
    inverse_prefix = {
        "backbone/stem": "backbone.backbone.stage1.0.conv",
        "backbone/down1": "backbone.backbone.stage1.1",
        "backbone/csp1": "backbone.backbone.stage1.2",
        "backbone/down2": "backbone.backbone.stage2.0",
        "backbone/csp2": "backbone.backbone.stage2.1",
        "backbone/down3": "backbone.backbone.stage3.0",
        "backbone/csp3": "backbone.backbone.stage3.1",
        "backbone/cbam3/channel/fc1": "backbone.backbone.stage3.2.channel_attention.shared_mlp.0",
        "backbone/cbam3/channel/fc2": "backbone.backbone.stage3.2.channel_attention.shared_mlp.2",
        "backbone/cbam3/spatial/conv": "backbone.backbone.stage3.2.spatial_attention.conv",
        "backbone/down4": "backbone.backbone.stage4.0",
        "backbone/csp4": "backbone.backbone.stage4.1",
        "backbone/spp4": "backbone.backbone.stage4.2",
        "neck/lateral5": "neck.lateral_conv5",
        "neck/lateral4": "neck.lateral_conv4",
        "neck/fpn4": "neck.fpn_conv4",
        "neck/fpn3": "neck.fpn_conv3",
        "neck/down3": "neck.downsample3",
        "neck/down4": "neck.downsample4",
        "neck/pan4": "neck.pan_conv4",
        "neck/pan5": "neck.pan_conv5",
        # enhanced-variant cross-layer attention (EnhancedSkyEyeDetector)
        "cross_attn_p5_p4/q_proj": "cross_attention_p5_p4.query_projection",
        "cross_attn_p5_p4/k_proj": "cross_attention_p5_p4.key_projection",
        "cross_attn_p5_p4/v_proj": "cross_attention_p5_p4.value_projection",
        "cross_attn_p5_p4/out_proj": "cross_attention_p5_p4.output_projection",
        "cross_attn_p4_p3/q_proj": "cross_attention_p4_p3.query_projection",
        "cross_attn_p4_p3/k_proj": "cross_attention_p4_p3.key_projection",
        "cross_attn_p4_p3/v_proj": "cross_attention_p4_p3.value_projection",
        "cross_attn_p4_p3/out_proj": "cross_attention_p4_p3.output_projection",
    }
    for pre, tpre in sorted(inverse_prefix.items(), key=lambda kv: -len(kv[0])):
        if joined.startswith(pre + "/") or joined == pre:
            rest = joined[len(pre):].strip("/")
            rest = re.sub(r"^m(\d+)", r"bottlenecks.\1", rest)
            rest = rest.replace("/", ".")
            return f"{tpre}.{rest}" if rest else tpre
    # head preds: the leaf's parent path is exactly head/pred{i} (a bare Conv),
    # with an optional deeper remainder for container variants
    m = re.match(r"head/pred(\d+)(?:/(.+))?$", joined)
    if m:
        base = f"detection_head.detection_layers.{m.group(1)}"
        return f"{base}.{m.group(2).replace('/', '.')}" if m.group(2) else base
    return None


def export_torch(module, variables, out: Path) -> Path:
    """Reverse-convert params to a reference-layout torch state_dict."""
    import jax
    import torch

    sd = {}
    skipped = 0

    def emit(tree, coll):
        for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
            names = [getattr(k, "key", str(k)) for k in path]
            leaf_name = names[-1]
            tkey = _flax_to_torch_key(names[:-1])
            if tkey is None:
                nonlocal skipped
                skipped += 1
                continue
            v = np.asarray(leaf)
            if leaf_name == "kernel":
                if v.ndim == 4:
                    if names[:-1] == ["backbone", "stem", "conv"]:
                        from ..models.blocks import unfuse_stem_kernel

                        v = unfuse_stem_kernel(v)  # fused 2kx2k -> reference kxk/4C
                    v = v.transpose(3, 2, 0, 1)  # HWIO -> OIHW
                    sd[f"{tkey}.weight"] = torch.tensor(v)
                else:
                    sd[f"{tkey}.weight"] = torch.tensor(v.transpose(1, 0))
            elif leaf_name == "scale":
                sd[f"{tkey}.weight"] = torch.tensor(v)
            elif leaf_name == "bias":
                sd[f"{tkey}.bias"] = torch.tensor(v)
            elif leaf_name == "mean":
                sd[f"{tkey}.running_mean"] = torch.tensor(v)
            elif leaf_name == "var":
                sd[f"{tkey}.running_var"] = torch.tensor(v)

    # bn paths end in .../bn/{scale,bias}; conv in .../conv/kernel — the inverse
    # prefix map keeps the reference's '.conv'/'.bn' containers because flax paths
    # mirror them
    emit(variables["params"], "params")
    emit(variables.get("batch_stats", {}), "batch_stats")
    torch.save({"state_dict": sd, "config": module.config.to_dict()}, out)
    LOGGER.info("torch export: %s (%d tensors, %d skipped)", out, len(sd), skipped)
    return out


def run(weights: str, formats=("stablehlo", "orbax"), img_size: int = 640,
        batch: int = 1, output: str = "exports", half: bool = False):
    import jax.numpy as jnp

    from ..utils.checkpoint import load_model

    module, variables, config = load_model(weights, fuse=True)
    out_dir = Path(output)
    out_dir.mkdir(parents=True, exist_ok=True)
    results = []
    for fmt in formats:
        if fmt == "stablehlo":
            results.append(export_stablehlo(
                module, variables, img_size, batch, out_dir / "model.stablehlo",
                dtype=jnp.bfloat16 if half else jnp.float32))
        elif fmt == "orbax":
            results.append(export_orbax(module, variables, out_dir / "orbax_ckpt"))
        elif fmt == "torch":
            results.append(export_torch(module, variables, out_dir / "model.pt"))
        else:
            raise ValueError(f"unknown export format {fmt!r}")
    return results


def parse_opt():
    p = argparse.ArgumentParser(description="SkyEye-TPU export")
    p.add_argument("--weights", type=str, required=True)
    p.add_argument("--formats", nargs="+", default=["stablehlo", "orbax"],
                   choices=["stablehlo", "orbax", "torch"])
    p.add_argument("--img-size", type=int, default=640)
    p.add_argument("--batch", type=int, default=1)
    p.add_argument("--output", type=str, default="exports")
    p.add_argument("--half", action="store_true")
    return p.parse_args()


def main():
    opt = parse_opt()
    run(**vars(opt))


if __name__ == "__main__":
    main()
