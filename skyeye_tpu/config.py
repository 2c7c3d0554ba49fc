"""Configuration system: model / data / hyperparameter schemas.

The reference's config planes (SURVEY.md §5.6) are reconstructed here:
  * model YAML keys `nc`, `base_channels`, `depth_multiple`, `width_multiple`, `anchors`
    (reference skyeye/core/models/detector.py:252-285 — the shipped YAML files are
    zero-byte, so the s/m/l multiplier tables use YOLOv5-convention values);
  * data YAML keys `path`, `train`, `val`, `nc`, `names`
    (reference skyeye/cli/train.py:81-88, validate.py:191-201);
  * training/augmentation hyperparameters
    (reference skyeye/core/loss/functions.py:335-343, augmentation.py:27-42,
    train.py:96-133).

Anchors are expressed in GRID UNITS per level (the convention the reference's decode
`wh = (2*sigmoid)^2 * anchor * stride` implies, detector.py:119-121,137-138, and its
loss `r = t_wh / anchors` consumes directly, functions.py:473).
"""
from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from pathlib import Path
from typing import Any, Dict, List, Tuple

import yaml

# YOLOv5-convention anchors in grid units (pixel anchors / stride for strides 8/16/32).
DEFAULT_ANCHORS: Tuple[Tuple[Tuple[float, float], ...], ...] = (
    ((1.25, 1.625), (2.0, 3.75), (4.125, 2.875)),        # P3/8
    ((1.875, 3.8125), (3.875, 2.8125), (3.6875, 7.4375)),  # P4/16
    ((3.625, 2.8125), (4.875, 6.1875), (11.65625, 10.1875)),  # P5/32
)

STRIDES: Tuple[int, int, int] = (8, 16, 32)

# Depth/width multiplier table for the s/m/l family (YOLOv5 convention — the
# reference's configs/models/*.yaml are zero-byte; SURVEY.md §5.6).
VARIANTS: Dict[str, Tuple[float, float]] = {
    "s": (0.33, 0.50),
    "m": (0.67, 0.75),
    "l": (1.0, 1.0),
}


@dataclass
class ModelConfig:
    """Architecture configuration for a SkyEye detector."""

    nc: int = 80
    base_channels: int = 64
    depth_multiple: float = 1.0
    width_multiple: float = 0.5
    anchors: Tuple[Tuple[Tuple[float, float], ...], ...] = DEFAULT_ANCHORS
    strides: Tuple[int, ...] = STRIDES
    in_channels: int = 3
    enhanced: bool = False  # EnhancedSkyEyeDetector: cross-layer attention in the neck
    transformer_heads: bool = False  # TransformerLayer-enhanced P5 head path
    # parity/weight-import mode: enhanced cross-attention runs the reference's
    # exact (repaired) degenerate semantics — see models/attention.py
    # CrossLayerAttention.ref_exact. Persisted so checkpoints rebuild correctly.
    ref_exact_cross_attn: bool = False
    variant: str = "s"

    @property
    def num_levels(self) -> int:
        return len(self.anchors)

    @property
    def num_anchors(self) -> int:
        return len(self.anchors[0])

    @classmethod
    def from_variant(cls, variant: str, nc: int = 80, **kw) -> "ModelConfig":
        name = variant.replace("skyeye_", "")
        if name not in VARIANTS:
            raise ValueError(f"unknown variant {variant!r}; expected one of {list(VARIANTS)}")
        d, w = VARIANTS[name]
        return cls(nc=nc, depth_multiple=d, width_multiple=w, variant=name, **kw)

    @classmethod
    def from_yaml(cls, path) -> "ModelConfig":
        with open(path, errors="ignore") as f:
            raw = yaml.safe_load(f) or {}
        return cls.from_dict(raw)

    @classmethod
    def from_dict(cls, raw: Dict[str, Any]) -> "ModelConfig":
        kw: Dict[str, Any] = {}
        for key in ("nc", "base_channels", "depth_multiple", "width_multiple",
                    "in_channels", "enhanced", "transformer_heads",
                    "ref_exact_cross_attn", "variant"):
            if key in raw and raw[key] is not None:
                kw[key] = raw[key]
        if raw.get("anchors"):
            anchors = raw["anchors"]
            # accept flat-per-level [[w,h,w,h,...], ...] or nested [[[w,h],...], ...]
            if anchors and not isinstance(anchors[0][0], (list, tuple)):
                anchors = [
                    [tuple(level[i : i + 2]) for i in range(0, len(level), 2)]
                    for level in anchors
                ]
            kw["anchors"] = tuple(tuple(tuple(a) for a in level) for level in anchors)
        return cls(**kw)

    def to_dict(self) -> Dict[str, Any]:
        d = dataclasses.asdict(self)
        d["anchors"] = [[list(a) for a in level] for level in self.anchors]
        d["strides"] = list(self.strides)
        return d

    def save_yaml(self, path) -> None:
        Path(path).write_text(yaml.safe_dump(self.to_dict(), sort_keys=False))


def load_model_config(cfg) -> ModelConfig:
    """Resolve a ModelConfig from a variant name, YAML path, dict, or ModelConfig."""
    if isinstance(cfg, ModelConfig):
        return cfg
    if isinstance(cfg, dict):
        return ModelConfig.from_dict(cfg)
    s = str(cfg)
    stem = Path(s).stem.replace(".yaml", "")
    if stem.replace("skyeye_", "") in VARIANTS and not Path(s).exists():
        return ModelConfig.from_variant(stem)
    return ModelConfig.from_yaml(s)


@dataclass
class DataConfig:
    """Dataset description (reference data-YAML schema)."""

    path: str = ""
    train: str = ""
    val: str = ""
    test: str = ""
    nc: int = 80
    names: List[str] = field(default_factory=list)

    @classmethod
    def from_yaml(cls, path) -> "DataConfig":
        with open(path, errors="ignore") as f:
            raw = yaml.safe_load(f) or {}
        names = raw.get("names") or []
        if isinstance(names, dict):
            names = [names[k] for k in sorted(names)]
        cfg = cls(
            path=str(raw.get("path", "")),
            train=str(raw.get("train", "")),
            val=str(raw.get("val", "")),
            test=str(raw.get("test", "")),
            nc=int(raw.get("nc", len(names) or 80)),
            names=list(names),
        )
        if not cfg.names:
            cfg.names = [str(i) for i in range(cfg.nc)]
        root = Path(cfg.path) if cfg.path else Path(path).parent
        for attr in ("train", "val", "test"):
            v = getattr(cfg, attr)
            if v and not Path(v).is_absolute():
                setattr(cfg, attr, str(root / v))
        return cfg


# Training + augmentation hyperparameters. Loss gains match the reference's hardcoded
# table (functions.py:335-343); augmentation values match augmentation.py:27-42;
# optimizer values match train.py:96-133 usage (YOLOv5 conventions fill the truncation).
DEFAULT_HYP: Dict[str, float] = {
    "lr0": 0.01,            # initial learning rate
    "lrf": 0.01,            # final lr fraction (cosine/linear target)
    "momentum": 0.937,
    "weight_decay": 0.0005,
    "warmup_epochs": 3.0,
    "warmup_momentum": 0.8,
    "warmup_bias_lr": 0.1,
    "box": 0.05,            # box loss gain
    "cls": 0.5,             # cls loss gain
    "cls_pw": 1.0,
    "obj": 1.0,             # obj loss gain
    "obj_pw": 1.0,
    "fl_gamma": 1.5,        # focal loss gamma (reference functions.py:341)
    "label_smoothing": 0.0,
    "iou_t": 0.2,
    "anchor_t": 4.0,        # anchor ratio threshold (functions.py:476)
    # augmentation (reference augmentation.py:27-42)
    "hsv_h": 0.015,
    "hsv_s": 0.7,
    "hsv_v": 0.4,
    "degrees": 0.0,
    "translate": 0.1,
    "scale": 0.5,
    "shear": 0.0,
    "perspective": 0.0,
    "flipud": 0.0,
    "fliplr": 0.5,
    "mosaic": 1.0,
    "mixup": 0.0,
    "copy_paste": 0.0,
}


def load_hyp(path=None) -> Dict[str, float]:
    hyp = dict(DEFAULT_HYP)
    if path:
        with open(path, errors="ignore") as f:
            hyp.update(yaml.safe_load(f) or {})
    return hyp
