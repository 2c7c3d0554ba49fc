"""CSP-Darknet backbone with CBAM attention and SPP, flax/NHWC.

Capability parity (reference /root/reference/skyeye/core/models/backbone.py:12-159):
4 stages — Focus + conv/2 + CSP(3d) -> conv/2 + CSP(9d) [P3/8] -> conv/2 + CSP(9d) +
CBAM [P4/16] -> conv/2 + CSP(3d) + SPP [P5/32], with depth/width multipliers.

Deviation (documented, SURVEY.md M14): the reference's SkyEyeBackbone reports channel
counts [2c, 4c, 8c]*w that do not match its actual stage outputs [4c, 8c, 16c]*w
(backbone.py:139-143 vs :40-42,99). Here `feature_channels()` derives the REAL output
channels so the neck always matches.
"""
from __future__ import annotations

from typing import Any, List

import flax.linen as nn
import jax.numpy as jnp

from .attention import CBAM
from .blocks import ConvBlock, CSPBlock, FocusBlock, SPPBlock


def scaled_channels(x: float, width_multiple: float) -> int:
    return max(round(x * width_multiple), 1)


def scaled_depth(x: int, depth_multiple: float) -> int:
    return max(round(x * depth_multiple), 1)


def feature_channels(base_channels: int, width_multiple: float) -> List[int]:
    """Actual [P3, P4, P5] channel counts emitted by the backbone."""
    return [
        scaled_channels(base_channels * 4, width_multiple),
        scaled_channels(base_channels * 8, width_multiple),
        scaled_channels(base_channels * 16, width_multiple),
    ]


class CSPDarknet(nn.Module):
    """Four-stage CSP-Darknet emitting [P3 (/8), P4 (/16), P5 (/32)]."""

    base_channels: int = 64
    depth_multiple: float = 1.0
    width_multiple: float = 1.0
    dtype: Any = jnp.float32
    # Serving-path input layout: take a 4x4 space-to-depth packed image
    # (B, H/4, W/4, 48) — or pack a raw (B, H, W, 3) one on device — and run the
    # first two convs in the s2d domain at full 128-lane utilization
    # (ops/packed_stem.py; exact weight remap via pack_stem_variables).
    packed_stem: bool = False
    # TRAIN-path packed stem: run the stem + down1 convs in the s2d4 packed
    # domain with CANONICAL params (ops/packed_stem_train.py — kernel remap
    # applied in-forward, differentiably; stem BN statistics phase-pooled,
    # exactly canonical). Pure layout choice: checkpoints/trees are unchanged
    # and the step is numerically equivalent. Measured motivation: the raw
    # 6x6/2 stem conv on 3/128 lanes cost ~11% of the train step @640 b16
    # (profiles/r3s8b_train640). Accepts raw (B,H,W,3) input (device pack) or
    # the s2d4-packed (B,H/4,W/4,48) frame.
    packed_stem_train: bool = False
    # Serving-path fused CSP: the stage-1 CSP runs as ONE Pallas kernel (all
    # intermediates VMEM-resident; the canonical per-conv schedule is HBM-bound
    # at these shapes — ops/pallas/csp_kernel.py; measured ~6% faster than XLA
    # on-chip at 320x320x64, while at csp2's 160x160x128 XLA wins, so only csp1
    # is fused). Use with variables transformed by
    # ops.fused_csp.fuse_csp_variables (BN-folded first).
    fused_csp: bool = False
    # Serving-path int8 PTQ for stages 1-2 (the HBM-bound 67% of the pipeline):
    # s8 convs with per-channel weight scales + calibrated per-tensor activation
    # scales; every inter-layer tensor stored int8 (ops/int8_stage.py). Use with
    # variables from ops.int8_stage.quantize_early_variables. Requires
    # packed_stem.
    int8_early: bool = False
    # Serving-path packed stage 1: csp1 + down2 run in a 2x2-s2d packed layout
    # at full 128-lane utilization (ops/packed_csp.py; exact weight remap via
    # pack_stage1_variables — the stage-1 C=32/64 tensors otherwise pay 2-4x
    # lane-padding HBM waste, measured profiles/r3_1280).
    packed_stage1: bool = False
    # Serving-path merged CSP split convs: each CSP's cv1+cv2 (two 1x1 convs
    # reading the SAME input) run as one conv — one HBM read of the input
    # instead of two (exact weight remap via ops/merged_csp.py).
    merged_csp: bool = False
    # Serving-path W-pair packed bottleneck chains for narrow CSPs (hidden <
    # 128 lanes): see CSPBlock.packed_m / ops.packed_csp.pack_csp_m_variables.
    packed_m_csp: bool = False
    # Serving-path int8 stem: the packed stem conv runs s8xs8->s32 on the 2x
    # int8 MXU path, consuming the uint8 frames directly (exact input
    # quantization; weights per-channel s8 — ops/int8_stem.py). Requires
    # packed_stem; variables from ops.int8_stem.quantize_stem_variables.
    int8_stem: bool = False
    # Training memory lever: rematerialize activations in the backward pass
    # (jax.checkpoint) instead of storing them. False = off; True/"block" =
    # checkpoint each CSP/SPP block (drops intra-block intermediates only,
    # measured ~1.06x at 1280px); "stage" = checkpoint each of the four
    # backbone stages, saving ONLY the stage-boundary tensors (stem input,
    # /8, /16, /32) — the real lever at high resolution. No effect on params
    # or numerics (bit-exact; tests/test_models.py).
    remat: Any = False

    @nn.compact
    def __call__(self, x, train: bool = False) -> List[jnp.ndarray]:
        level = "block" if self.remat is True else self.remat
        CSP = nn.remat(CSPBlock, static_argnums=(2,)) if level == "block" else CSPBlock
        SPP = nn.remat(SPPBlock, static_argnums=(2,)) if level == "block" else SPPBlock
        w, d = self.width_multiple, self.depth_multiple
        c1 = scaled_channels(self.base_channels, w)
        c2 = scaled_channels(self.base_channels * 2, w)
        c3 = scaled_channels(self.base_channels * 4, w)
        c4 = scaled_channels(self.base_channels * 8, w)
        c5 = scaled_channels(self.base_channels * 16, w)

        # Stage-level remat wraps whole stages with jax.checkpoint (only the
        # canonical training path for stages 1-2; serving layouts never train).
        # Stage bodies are defined ONCE below and shared by every path — each
        # takes the module first so nn.remat can lift it over this scope;
        # submodule names are unchanged, so param trees are identical across
        # remat levels (tests/test_models.py::test_remat_is_numerically_transparent).
        use_stage = level == "stage" and not (
            self.packed_stem or self.packed_stage1
            or self.fused_csp or self.int8_early)
        wrap = ((lambda f: nn.remat(f, static_argnums=(2,)))
                if use_stage else (lambda f: f))

        def stem_down1(mdl, x, train):
            if mdl.packed_stem_train:
                from ..ops.packed_stem_train import (
                    PackedTrainDown1, PackedTrainFocus,
                )

                x = PackedTrainFocus(c1, dtype=mdl.dtype, name="stem")(x, train)
                return PackedTrainDown1(c2, dtype=mdl.dtype,
                                        name="down1")(x, train)
            x = FocusBlock(c1, kernel_size=3, dtype=mdl.dtype,
                           name="stem")(x, train)
            return ConvBlock(c2, 3, stride=2, dtype=mdl.dtype,
                             name="down1")(x, train)

        def csp1_down2(mdl, x, train):
            x = CSP(c2, scaled_depth(3, d), dtype=mdl.dtype,
                    merged_cv12=mdl.merged_csp, packed_m=mdl.packed_m_csp,
                    name="csp1")(x, train)
            return ConvBlock(c3, 3, stride=2, dtype=mdl.dtype,
                             name="down2")(x, train)

        def stage1(mdl, x, train):
            return csp1_down2(mdl, stem_down1(mdl, x, train), train)

        def stage2(mdl, x, train):
            return CSP(c3, scaled_depth(9, d), dtype=mdl.dtype,
                       merged_cv12=mdl.merged_csp, packed_m=mdl.packed_m_csp,
                       name="csp2")(x, train)

        def stage3(mdl, x, train):
            x = ConvBlock(c4, 3, stride=2, dtype=mdl.dtype,
                          name="down3")(x, train)
            x = CSP(c4, scaled_depth(9, d), dtype=mdl.dtype,
                    merged_cv12=mdl.merged_csp, packed_m=mdl.packed_m_csp,
                    name="csp3")(x, train)
            return CBAM(dtype=mdl.dtype, name="cbam3")(x)

        def stage4(mdl, x, train):
            x = ConvBlock(c5, 3, stride=2, dtype=mdl.dtype,
                          name="down4")(x, train)
            x = CSP(c5, scaled_depth(3, d), dtype=mdl.dtype,
                    merged_cv12=mdl.merged_csp, packed_m=mdl.packed_m_csp,
                    name="csp4")(x, train)
            return SPP(c5, dtype=mdl.dtype, name="spp4")(x, train)

        if use_stage:
            x = wrap(stage1)(self, x, train)
            p3 = wrap(stage2)(self, x, train)
        elif self.int8_early:
            assert self.packed_stem, "int8_early requires the packed-stem layout"
            from ..ops.int8_stage import Int8EarlyStage
            from ..ops.packed_stem import s2d4_device

            if x.shape[-1] == 3:
                x = s2d4_device(x)
            p3 = Int8EarlyStage(
                c1=c1, c2=c2, c3=c3, nb1=scaled_depth(3, d),
                nb2=scaled_depth(9, d), dtype=self.dtype, name="int8_early",
            )(x, train)
        else:
            # Stage 1 (/4): Focus -> conv/2 -> CSP(3d)
            if self.packed_stem:
                import os as _os

                import jax as _jax

                from ..ops.packed_stem import s2d4_device

                if x.shape[-1] == 3:  # raw image: pack on device
                    x = s2d4_device(x)
                if self.int8_stem:
                    from ..ops.int8_stem import Int8PackedStem

                    x = Int8PackedStem(4 * c1, dtype=self.dtype,
                                       name="stem")(x, train)
                else:
                    x = ConvBlock(4 * c1, 3, stride=1, dtype=self.dtype,
                                  name="stem")(x, train)
                if not _os.environ.get("SKYEYE_NO_STEM_BARRIER"):
                    # Round-4 per-op attribution (profiles/r4s1_1280): XLA
                    # fuses the stem conv INTO down1's fusion and recomputes
                    # it per output tile — fusion.9 measures 3.81 ms vs a
                    # 1.69 ms floor. The barrier materializes the stem output
                    # once (~0.5 ms HBM) instead of recomputing the stem MXU
                    # work: measured +1.5% @1280 b16 (758.5 -> 770.2 img/s,
                    # tools/ab_serving.py 2026-08-19). SKYEYE_NO_STEM_BARRIER
                    # opts out.
                    x = _jax.lax.optimization_barrier(x)
                if self.packed_stage1:
                    # packed-in/packed-out down1 (pack_down1_p2p_kernel): emits
                    # the 2x2-s2d layout PackedStage1 consumes — no transpose
                    x = ConvBlock(4 * c2, 3, stride=2, padding=((1, 0), (1, 0)),
                                  dtype=self.dtype, name="down1")(x, train)
                else:
                    x = ConvBlock(c2, 2, stride=1, padding=((1, 0), (1, 0)),
                                  dtype=self.dtype, name="down1")(x, train)
            else:
                x = stem_down1(self, x, train)
            if self.packed_stage1:
                assert not (self.fused_csp or self.int8_early), (
                    "packed_stage1 is exclusive with fused_csp/int8_early")
                from ..ops.packed_csp import PackedStage1

                # csp1 + down2 in one packed-domain stage (emits canonical /8);
                # with packed_stem the input is already 2x2-s2d packed (p2p down1)
                x = PackedStage1(c2=c2, c3=c3, num_blocks=scaled_depth(3, d),
                                 packed_input=self.packed_stem,
                                 dtype=self.dtype, name="packed_stage1")(x, train)
            elif self.fused_csp:
                from ..ops.fused_csp import FusedCSPBlock

                x = FusedCSPBlock(c2, scaled_depth(3, d), dtype=self.dtype,
                                  name="csp1")(x, train)
                x = ConvBlock(c3, 3, stride=2, dtype=self.dtype,
                              name="down2")(x, train)
            else:
                x = csp1_down2(self, x, train)

            # Stage 2 (/8) -> P3
            p3 = stage2(self, x, train)

        # Stage 3 (/16) -> P4, with CBAM; Stage 4 (/32) -> P5, with SPP
        p4 = wrap(stage3)(self, p3, train)
        p5 = wrap(stage4)(self, p4, train)

        return [p3, p4, p5]
