"""SkyEye detector assembly: backbone + neck + head (+ enhanced cross-layer attention).

Capability parity (reference /root/reference/skyeye/core/models/detector.py:234-501):
  SkyEyeDetectorModule  <- SkyEyeDetector assembly (:234-341) — config-driven
      backbone/neck/head; strides are architectural [8, 16, 32] (the reference derives
      the same values from a dummy 64px trace, :291-295).
  enhanced=True         <- EnhancedSkyEyeDetector (:436-501) — residual
      CrossLayerAttention P5->P4 then P4->P3 between neck and head (:488-489).
  parse_model / construct_model (:374-433).

The flax module is a pure function of (params, batch_stats, x). The convenience
`create_detector` builds the module plus initialized variables. The user-facing
`SkyEyeDetector(weights=...)` facade with `.show()/.save()` lives in
skyeye_tpu/api.py (README.md:39-53 capability).
"""
from __future__ import annotations

from typing import Any, List, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..config import ModelConfig, load_model_config
from .attention import CrossLayerAttention
from .backbone import CSPDarknet, feature_channels
from .head import DetectionHead, decode_predictions
from .neck import FeatureNeck


class SkyEyeDetectorModule(nn.Module):
    """Full detector: returns raw per-level logits; decode is a separate pure fn."""

    config: ModelConfig
    dtype: Any = jnp.float32
    # serving-path s2d-packed first stage (ops/packed_stem.py); use with variables
    # transformed by pack_stem_variables — numerically exact, ~2x faster stage 1
    packed_stem: bool = False
    # TRAIN-path packed stem: stem + down1 in the s2d4 domain with CANONICAL
    # params (in-forward differentiable remap + phase-pooled BN stats,
    # ops/packed_stem_train.py) — numerically equivalent, same tree; kills the
    # 3/128-lane stem convs that cost ~11% of the train step (r3s8b profile)
    packed_stem_train: bool = False
    # serving-path fused CSP stages 1-2 as Pallas kernels (ops/fused_csp.py);
    # use with variables transformed by fuse_csp_variables (after fuse_conv_bn)
    fused_csp: bool = False
    # serving-path int8 PTQ early backbone (ops/int8_stage.py); use with
    # variables from quantize_early_variables (calibrated; requires packed_stem)
    int8_early: bool = False
    # serving-path packed stage 1 (ops/packed_csp.py); use with variables
    # transformed by pack_stage1_variables — numerically exact full-lane csp1
    packed_stage1: bool = False
    # serving-path merged CSP split convs (one cv1+cv2 conv per CSP; use with
    # variables transformed by ops.merged_csp.merge_csp_cv12_variables)
    merged_csp: bool = False
    # serving-path W-pair packed bottleneck chains for narrow (hidden < 128)
    # CSPs; use with variables from ops.packed_csp.pack_csp_m_variables
    packed_m_csp: bool = False
    # serving-path int8 stem conv on the 2x int8 MXU, consuming uint8 frames
    # directly (ops/int8_stem.py; variables from quantize_stem_variables)
    int8_stem: bool = False
    # serving-path int8 neck: every FPN/PAN conv s8xs8->s32 with calibrated
    # activation scales (ops/int8_neck.py; variables from
    # quantize_neck_variables — the 1.28x neck-class unit win, end-to-end)
    int8_neck: bool = False
    # parity/weight-import mode: run the enhanced cross-layer attention with the
    # reference's exact (repaired) degenerate semantics — see
    # CrossLayerAttention.ref_exact. Only meaningful with config.enhanced.
    ref_exact_cross_attn: bool = False
    # training memory lever: rematerialize activations in the backward pass
    # (jax.checkpoint). False | True/"block" (per CSP/SPP block) | "stage"
    # (whole backbone stages + whole neck; saves only pyramid boundaries —
    # the real lever at high resolution). Params and numerics are unchanged,
    # so the flag does not need to persist in checkpoints.
    remat: Any = False

    @nn.compact
    def __call__(self, x, train: bool = False) -> List[jnp.ndarray]:
        cfg = self.config
        feats = CSPDarknet(
            base_channels=cfg.base_channels,
            depth_multiple=cfg.depth_multiple,
            width_multiple=cfg.width_multiple,
            dtype=self.dtype,
            packed_stem=self.packed_stem,
            packed_stem_train=self.packed_stem_train,
            fused_csp=self.fused_csp,
            int8_early=self.int8_early,
            packed_stage1=self.packed_stage1,
            merged_csp=self.merged_csp,
            packed_m_csp=self.packed_m_csp,
            int8_stem=self.int8_stem,
            remat=self.remat,
            name="backbone",
        )(x, train)

        channels = feature_channels(cfg.base_channels, cfg.width_multiple)
        if self.int8_neck:
            from ..ops.int8_neck import Int8Neck

            # FeatureNeck hardcodes 3 bottlenecks per CSP (not depth-scaled,
            # mirroring the reference's neck) — Int8Neck must match exactly
            p3, p4, p5 = Int8Neck(
                in_channels=tuple(channels), num_blocks=3,
                dtype=self.dtype, name="neck",
            )(feats, train)
        else:
            Neck = (nn.remat(FeatureNeck, static_argnums=(2,))
                    if self.remat == "stage" else FeatureNeck)
            p3, p4, p5 = Neck(
                in_channels=tuple(channels), dtype=self.dtype,
                remat=(self.remat is True or self.remat == "block"),
                merged_csp=self.merged_csp,
                packed_m_csp=self.packed_m_csp,
                name="neck"
            )(feats, train)

        if cfg.enhanced:
            c3, c4, c5 = channels
            ref_exact = self.ref_exact_cross_attn or cfg.ref_exact_cross_attn
            p4 = (
                CrossLayerAttention(
                    query_channels=c4, key_channels=c5, region_size=2, heads=4,
                    dtype=self.dtype, ref_exact=ref_exact,
                    name="cross_attn_p5_p4",
                )(p4, p5)
                + p4
            )
            p3 = (
                CrossLayerAttention(
                    query_channels=c3, key_channels=c4, region_size=2, heads=4,
                    dtype=self.dtype, ref_exact=ref_exact,
                    name="cross_attn_p4_p3",
                )(p3, p4)
                + p3
            )

        return DetectionHead(
            num_classes=cfg.nc,
            num_anchors=cfg.num_anchors,
            num_levels=cfg.num_levels,
            transformer_heads=cfg.transformer_heads,
            dtype=self.dtype,
            name="head",
        )([p3, p4, p5], train)

    def decode(self, outputs, input_shape) -> jnp.ndarray:
        return decode_predictions(outputs, jnp.asarray(self.config.anchors), input_shape)


def create_detector(
    cfg="skyeye_s",
    num_classes: Optional[int] = None,
    anchors=None,
    dtype=jnp.float32,
    rng: Optional[jax.Array] = None,
    img_size: int = 64,
    ref_exact_cross_attn: Optional[bool] = None,
    remat: Any = False,
    packed_stem_train: bool = False,
) -> Tuple[SkyEyeDetectorModule, dict]:
    """Build module + initialized variables (params, batch_stats).

    Mirrors reference SkyEyeDetector.__init__ overrides (detector.py:260-265):
    `num_classes` / `anchors` args win over the config file values.
    `ref_exact_cross_attn` is recorded on the config so checkpoints rebuild the
    same architecture. `packed_stem_train` is a pure layout choice (identical
    param tree — ops/packed_stem_train.py), so it is NOT recorded on the config.
    """
    config = load_model_config(cfg)
    if num_classes is not None and num_classes != config.nc:
        config = _replace(config, nc=num_classes)
    if anchors is not None:
        config = _replace(config, anchors=_normalize_anchors(anchors))
    if ref_exact_cross_attn is not None:
        config = _replace(config, ref_exact_cross_attn=ref_exact_cross_attn)

    module = SkyEyeDetectorModule(config=config, dtype=dtype, remat=remat,
                                  packed_stem_train=packed_stem_train)
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    dummy = jnp.zeros((1, img_size, img_size, config.in_channels), dtype)
    variables = module.init(rng, dummy, train=False)
    return module, variables


def _replace(config: ModelConfig, **kw) -> ModelConfig:
    import dataclasses

    return dataclasses.replace(config, **kw)


def _normalize_anchors(anchors) -> tuple:
    return tuple(
        tuple(tuple(float(v) for v in a) for a in level) for level in anchors
    )


def parse_model(model_cfg, in_channels: int = 3) -> dict:
    """Parse a model configuration into resolved parameters (detector.py:374-406)."""
    config = load_model_config(model_cfg)
    return {
        "base_channels": config.base_channels,
        "depth_multiple": config.depth_multiple,
        "width_multiple": config.width_multiple,
        "nc": config.nc,
        "in_channels": in_channels,
        "anchors": [[list(a) for a in level] for level in config.anchors],
    }


def construct_model(model_cfg, in_channels: int = 3, num_classes=None, anchors=None,
                    dtype=jnp.float32):
    """Construct (module, variables) from a config (detector.py:409-433)."""
    return create_detector(model_cfg, num_classes=num_classes, anchors=anchors,
                           dtype=dtype)


def model_strides(config: ModelConfig) -> Tuple[int, ...]:
    """Architectural strides for the 3 pyramid levels."""
    return tuple(config.strides)
