"""Checkpointing: orbax save/resume, torch .pt conversion, BN folding, stripping.

Capability parity (reference, SURVEY.md §5.4):
  * save/resume convention — dict of epoch, best_fitness, model, ema, updates,
    optimizer; files last/best under save_dir/weights (skyeye/cli/train.py:139-157,
    61-66). Here: orbax directories `last/` and `best/` holding one pytree with the
    same logical fields.
  * `load_model(weights, device=...)` — declared-but-missing loader both CLI entries
    import (skyeye/cli/validate.py:22, detect.py:23; SURVEY.md §2.7#3).
  * partial/shape-filtered load with count report (detector.py:343-371), including the
    three torch checkpoint wrapper conventions: {'model': nn.Module}, {'state_dict':
    ...}, bare state_dict (detector.py:353-359).
  * torch NCHW -> NHWC/HWIO weight transposition + name mapping (SURVEY.md §7 hard
    parts): reference module names (backbone.backbone.stageN..., neck.*,
    detection_head.detection_layers.N) -> this package's flax paths.
  * `strip_optimizer` (train.py:37): keep only EMA params for deployment.
  * BN folding for fused inference (reference ConvolutionBlock.fused_forward,
    blocks.py:39-41) — `fuse_conv_bn` rewrites (params, batch_stats) so conv kernels
    absorb the BN affine; inference then skips the BN op entirely.
"""
from __future__ import annotations

import re
from pathlib import Path
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .general import LOGGER

# -- orbax save / restore ------------------------------------------------------


def _checkpointer():
    import orbax.checkpoint as ocp

    return ocp.PyTreeCheckpointer()


# Non-array metadata fields stored as JSON beside the orbax pytree (orbax/tensorstore
# cannot serialize string leaves such as config.variant).
_META_KEYS = ("config", "epoch", "best_fitness", "hyp", "names", "opt", "step")


def save_checkpoint(path, payload: Dict[str, Any]) -> None:
    """Save a checkpoint to a directory (last/ or best/): numeric pytree via orbax
    plus a meta.json for config/epoch/fitness fields."""
    import json

    path = Path(path).resolve()
    meta = {}
    arrays = {}
    for k, v in payload.items():
        if k in _META_KEYS:
            meta[k] = v if not isinstance(v, (np.generic, jnp.ndarray)) else np.asarray(v).item()
        else:
            arrays[k] = v
    # one batched device->host fetch for the whole tree: per-leaf np.asarray would
    # issue a blocking round-trip per array (~hundreds of leaves x the relay's
    # per-call latency dominated epoch time)
    arrays = jax.device_get(arrays)
    _checkpointer().save(path, arrays, force=True)
    (path / "meta.json").write_text(json.dumps(meta, default=float))


def load_checkpoint(path) -> Dict[str, Any]:
    import json

    path = Path(path).resolve()
    out = dict(_checkpointer().restore(path))
    meta_file = path / "meta.json"
    if meta_file.exists():
        out.update(json.loads(meta_file.read_text()))
    return out


def flatten_leaves(tree) -> Dict[str, Any]:
    """Serialize an arbitrary pytree (e.g. optax opt_state with NamedTuple nodes) as
    a flat, orbax-friendly dict of its leaves in tree order. Rebuild with
    `unflatten_like` against a freshly-initialized state of the same structure."""
    leaves = jax.tree_util.tree_leaves(tree)
    return {f"{i:05d}": l for i, l in enumerate(leaves)}


def unflatten_like(template, flat: Dict[str, Any]):
    """Inverse of `flatten_leaves`: pour saved leaves into `template`'s structure.
    Raises ValueError on leaf-count or shape mismatch (e.g. optimizer config drift),
    so callers can fall back to a fresh opt_state rather than resume wrongly."""
    leaves, treedef = jax.tree_util.tree_flatten(template)
    saved = [flat[k] for k in sorted(flat)]
    if len(saved) != len(leaves):
        raise ValueError(
            f"opt_state leaf count mismatch: saved {len(saved)} vs expected {len(leaves)}"
        )
    cast = []
    for s, t in zip(saved, leaves):
        t = jnp.asarray(t)
        if np.shape(s) != t.shape:
            raise ValueError(f"opt_state leaf shape mismatch: {np.shape(s)} vs {t.shape}")
        cast.append(jnp.asarray(s, t.dtype))
    return jax.tree_util.tree_unflatten(treedef, cast)


def strip_checkpoint(path, half: bool = False) -> None:
    """Reduce a training checkpoint to deployable EMA weights only."""
    ckpt = load_checkpoint(path)
    params = ckpt.get("ema_params") or ckpt.get("params")
    stats = ckpt.get("batch_stats", {})
    if half:
        params = jax.tree_util.tree_map(
            lambda x: x.astype(np.float16) if np.issubdtype(np.asarray(x).dtype, np.floating) else x,
            params,
        )
    out = {
        "params": params,
        "batch_stats": stats,
        "config": ckpt.get("config", {}),
        "epoch": ckpt.get("epoch", -1),
        "best_fitness": ckpt.get("best_fitness", 0.0),
    }
    save_checkpoint(path, out)
    LOGGER.info("stripped checkpoint %s (EMA weights only)", path)


# -- torch .pt conversion ------------------------------------------------------

# Prefix rules: reference module path -> flax path segments.
_PREFIX_RULES = [
    # the fused stem: flax FocusBlock holds conv/bn directly (models/blocks.py);
    # the conv kernel additionally goes through fused_stem_kernel (post-pass below)
    (r"^backbone\.backbone\.stage1\.0\.conv\.", "backbone/stem/"),
    (r"^backbone\.backbone\.stage1\.1\.", "backbone/down1/"),
    (r"^backbone\.backbone\.stage1\.2\.", "backbone/csp1/"),
    (r"^backbone\.backbone\.stage2\.0\.", "backbone/down2/"),
    (r"^backbone\.backbone\.stage2\.1\.", "backbone/csp2/"),
    (r"^backbone\.backbone\.stage3\.0\.", "backbone/down3/"),
    (r"^backbone\.backbone\.stage3\.1\.", "backbone/csp3/"),
    (r"^backbone\.backbone\.stage3\.2\.channel_attention\.shared_mlp\.0\.", "backbone/cbam3/channel/fc1/"),
    (r"^backbone\.backbone\.stage3\.2\.channel_attention\.shared_mlp\.2\.", "backbone/cbam3/channel/fc2/"),
    (r"^backbone\.backbone\.stage3\.2\.spatial_attention\.conv\.", "backbone/cbam3/spatial/conv/"),
    (r"^backbone\.backbone\.stage4\.0\.", "backbone/down4/"),
    (r"^backbone\.backbone\.stage4\.1\.", "backbone/csp4/"),
    (r"^backbone\.backbone\.stage4\.2\.", "backbone/spp4/"),
    (r"^neck\.lateral_conv5\.", "neck/lateral5/"),
    (r"^neck\.lateral_conv4\.", "neck/lateral4/"),
    (r"^neck\.fpn_conv4\.", "neck/fpn4/"),
    (r"^neck\.fpn_conv3\.", "neck/fpn3/"),
    (r"^neck\.downsample3\.", "neck/down3/"),
    (r"^neck\.downsample4\.", "neck/down4/"),
    (r"^neck\.pan_conv4\.", "neck/pan4/"),
    (r"^neck\.pan_conv5\.", "neck/pan5/"),
    (r"^detection_head\.detection_layers\.(\d+)\.", r"head/pred\1/"),
    (r"^cross_attention_p5_p4\.query_projection\.", "cross_attn_p5_p4/q_proj/"),
    (r"^cross_attention_p5_p4\.key_projection\.", "cross_attn_p5_p4/k_proj/"),
    (r"^cross_attention_p5_p4\.value_projection\.", "cross_attn_p5_p4/v_proj/"),
    (r"^cross_attention_p5_p4\.output_projection\.", "cross_attn_p5_p4/out_proj/"),
    (r"^cross_attention_p4_p3\.query_projection\.", "cross_attn_p4_p3/q_proj/"),
    (r"^cross_attention_p4_p3\.key_projection\.", "cross_attn_p4_p3/k_proj/"),
    (r"^cross_attention_p4_p3\.value_projection\.", "cross_attn_p4_p3/v_proj/"),
    (r"^cross_attention_p4_p3\.output_projection\.", "cross_attn_p4_p3/out_proj/"),
]

# Inner-block rules applied after the prefix (CSP bottlenecks, conv-block internals).
_INNER_RULES = [
    (r"bottlenecks\.(\d+)\.", r"m\1/"),
    (r"cv1\.", "cv1/"),
    (r"cv2\.", "cv2/"),
    (r"cv3\.", "cv3/"),
    (r"conv\.conv\.", "conv/conv/"),
]


def _translate_key(torch_key: str) -> Optional[Tuple[Tuple[str, ...], str, str]]:
    """torch state_dict key -> (flax_path, leaf_kind, collection).

    leaf_kind in {conv_kernel, linear_kernel, bias, bn_scale, bn_bias, bn_mean,
    bn_var}; collection in {params, batch_stats}.
    """
    key = torch_key
    for pat, repl in _PREFIX_RULES:
        if re.match(pat, key):
            key = re.sub(pat, repl, key)
            break
    else:
        return None
    for pat, repl in _INNER_RULES:
        key = re.sub(pat, repl, key)

    # leaf translation
    m = re.search(r"(?:^|/)(conv|bn)\.(weight|bias|running_mean|running_var|num_batches_tracked)$", key)
    if m:
        mod, leaf = m.group(1), m.group(2)
        base = key[: m.start()].strip("/")
        if mod == "conv":
            if leaf == "weight":
                return tuple(base.split("/") + ["conv", "kernel"]), "conv_kernel", "params"
            if leaf == "bias":
                return tuple(base.split("/") + ["conv", "bias"]), "bias", "params"
        else:
            table = {
                "weight": ("scale", "bn_scale", "params"),
                "bias": ("bias", "bn_bias", "params"),
                "running_mean": ("mean", "bn_mean", "batch_stats"),
                "running_var": ("var", "bn_var", "batch_stats"),
            }
            if leaf == "num_batches_tracked":
                return None
            name, kind, coll = table[leaf]
            return tuple(base.split("/") + ["bn", name]), kind, coll

    # plain conv/linear modules addressed directly (head preds, attention projections,
    # CBAM MLP Linear layers)
    m = re.search(r"[./](weight|bias)$", key)
    if m:
        base = key[: m.start()].strip("/").replace(".", "/")
        leaf = m.group(1)
        if leaf == "bias":
            return tuple(base.split("/") + ["bias"]), "bias", "params"
        return tuple(base.split("/") + ["kernel"]), "auto_kernel", "params"
    return None


def _convert_leaf(value: np.ndarray, kind: str) -> np.ndarray:
    v = np.asarray(value)
    if kind == "conv_kernel" or (kind == "auto_kernel" and v.ndim == 4):
        return v.transpose(2, 3, 1, 0)  # OIHW -> HWIO
    if kind == "linear_kernel" or (kind == "auto_kernel" and v.ndim == 2):
        return v.transpose(1, 0)  # (O, I) -> (I, O)
    return v


def convert_torch_state_dict(state_dict: Dict[str, Any]) -> Dict[str, Dict]:
    """Translate a reference-model torch state_dict into flax {params, batch_stats}."""
    out = {"params": {}, "batch_stats": {}}
    unmatched = []
    for k, v in state_dict.items():
        v = np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach") else v)
        tr = _translate_key(k)
        if tr is None:
            unmatched.append(k)
            continue
        path, kind, coll = tr
        node = out[coll]
        for seg in path[:-1]:
            node = node.setdefault(seg, {})
        node[path[-1]] = _convert_leaf(v, kind)
    if unmatched:
        LOGGER.info("torch conversion: %d keys unmatched (e.g. %s)", len(unmatched), unmatched[:3])

    # post-pass: the Focus stem is a fused 2k x 2k stride-2 conv here; rearrange the
    # reference's k x k-over-s2d kernel into the exactly-equivalent fused form
    try:
        stem = out["params"]["backbone"]["stem"]["conv"]
        if "kernel" in stem and stem["kernel"].shape[2] % 4 == 0:
            from ..models.blocks import fused_stem_kernel

            stem["kernel"] = fused_stem_kernel(stem["kernel"])
    except KeyError:
        pass
    return out


def load_torch_checkpoint(path) -> Dict[str, Any]:
    """Read a torch .pt file handling the reference's three wrapper conventions
    (detector.py:353-359). Returns {params, batch_stats, meta}."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    meta: Dict[str, Any] = {}
    if isinstance(ckpt, dict) and "model" in ckpt and hasattr(ckpt["model"], "state_dict"):
        sd = ckpt["model"].float().state_dict()
        meta = {k: v for k, v in ckpt.items() if k != "model"}
    elif isinstance(ckpt, dict) and "state_dict" in ckpt:
        sd = ckpt["state_dict"]
        meta = {k: v for k, v in ckpt.items() if k != "state_dict"}
    elif isinstance(ckpt, dict):
        sd = ckpt
    else:  # a bare module
        sd = ckpt.state_dict()
    converted = convert_torch_state_dict(sd)
    converted["meta"] = meta
    return converted


def merge_matching(target: Dict, source: Dict, prefix: str = "") -> Tuple[Dict, int, int]:
    """Shape-filtered partial load (reference detector.py:361-367 semantics):
    copy source leaves into target where path+shape match. Returns
    (merged, n_loaded, n_total_target)."""
    n_loaded = 0

    def walk(t, s):
        nonlocal n_loaded
        out = {}
        for k, tv in t.items():
            sv = s.get(k) if isinstance(s, dict) else None
            if isinstance(tv, dict):
                # guard structure mismatch: source may hold an ndarray where the
                # target has a subtree ("truth value of an array is ambiguous")
                out[k] = walk(tv, sv if isinstance(sv, dict) else {})
            else:
                if sv is not None and np.shape(sv) == np.shape(tv):
                    out[k] = jnp.asarray(sv, dtype=jnp.asarray(tv).dtype)
                    n_loaded += 1
                else:
                    out[k] = tv
        return out

    merged = walk(target, source)
    n_total = len(jax.tree_util.tree_leaves(target))
    return merged, n_loaded, n_total


def load_model(weights, num_classes: Optional[int] = None, dtype=jnp.float32,
               fuse: bool = False):
    """Universal model loader (the missing reference `load_model`, SURVEY.md §2.7#3).

    `weights` may be: an orbax checkpoint dir, a torch .pt file, or a variant name
    ('skyeye_s'/'m'/'l' — randomly initialized). Returns (module, variables, config).
    """
    from ..config import ModelConfig
    from ..models.detector import create_detector

    path = Path(str(weights))
    if path.suffix in (".pt", ".pth") and path.exists():
        conv = load_torch_checkpoint(path)
        meta_cfg = conv["meta"].get("config") if isinstance(conv.get("meta"), dict) else None
        config = ModelConfig.from_dict(meta_cfg) if meta_cfg else ModelConfig.from_variant(
            _guess_variant(path.stem), nc=num_classes or 80
        )
        if num_classes:
            import dataclasses

            config = dataclasses.replace(config, nc=num_classes)
        module, variables = create_detector(config, dtype=dtype)
        params, np_, nt = merge_matching(variables["params"], conv["params"])
        stats, ns, _ = merge_matching(variables.get("batch_stats", {}), conv["batch_stats"])
        LOGGER.info("loaded %d/%d params (+%d BN stats) from %s", np_, nt, ns, path)
        variables = {"params": params, "batch_stats": stats}
    elif path.is_dir():
        ckpt = load_checkpoint(path)
        cfg_dict = ckpt.get("config") or {}
        config = ModelConfig.from_dict(cfg_dict) if cfg_dict else ModelConfig.from_variant("s")
        module, variables = create_detector(config, dtype=dtype)
        params = ckpt.get("ema_params") or ckpt.get("params")
        params, np_, nt = merge_matching(variables["params"], params)
        stats, _, _ = merge_matching(variables.get("batch_stats", {}), ckpt.get("batch_stats", {}))
        LOGGER.info("restored %d/%d params from %s", np_, nt, path)
        variables = {"params": params, "batch_stats": stats}
    else:
        module, variables = create_detector(str(weights), num_classes=num_classes, dtype=dtype)
        config = module.config
    if fuse:
        variables = fuse_conv_bn(variables)
    return module, variables, config


def _guess_variant(stem: str) -> str:
    for v in ("s", "m", "l"):
        if stem.endswith(f"_{v}"):
            return v
    return "s"


# -- BN folding ----------------------------------------------------------------


def fuse_conv_bn(variables: Dict, eps: float = 1e-5) -> Dict:
    """Fold BatchNorm affine+stats into the preceding conv kernel.

    For every subtree {conv: {kernel}, bn: {scale, bias}} with matching batch_stats
    {bn: {mean, var}}: kernel' = kernel * scale/sqrt(var+eps); bias' = bias -
    mean*scale/sqrt(var+eps). The bn params are set to identity (scale=1, bias=0,
    mean=0, var=1-eps) so the same module graph computes the fused result; XLA folds
    the now-constant BN into the conv epilogue. Mirrors the reference's fused_forward
    capability (blocks.py:39-41) without needing a second code path.
    """
    import copy

    params = copy.deepcopy(jax.tree_util.tree_map(np.asarray, variables["params"]))
    stats = copy.deepcopy(jax.tree_util.tree_map(np.asarray, variables.get("batch_stats", {})))

    def walk(p, s):
        if not isinstance(p, dict):
            return
        if "conv" in p and "bn" in p and isinstance(s, dict) and "bn" in s:
            conv, bn, sbn = p["conv"], p["bn"], s["bn"]
            if "kernel" in conv and "scale" in bn and "mean" in sbn:
                k = conv["kernel"]
                g = bn["scale"] / np.sqrt(sbn["var"] + eps)
                conv["kernel"] = k * g[None, None, None, :]
                # residual bias lives in the (now-identity) BN: with mean=0,
                # var=1-eps, scale=1 the BN computes y + bias'
                bn["bias"] = bn["bias"] - sbn["mean"] * g
                bn["scale"] = np.ones_like(bn["scale"])
                sbn["mean"] = np.zeros_like(sbn["mean"])
                sbn["var"] = np.ones_like(sbn["var"]) - eps
        for key, v in p.items():
            walk(v, s.get(key, {}) if isinstance(s, dict) else {})

    walk(params, stats)
    return {"params": params, "batch_stats": stats}
