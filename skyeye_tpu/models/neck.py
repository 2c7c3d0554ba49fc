"""FPN/PAN feature neck, flax/NHWC.

Capability parity (reference /root/reference/skyeye/core/models/detector.py:148-231):
top-down lateral 1x1 convs + nearest-upsample + concat + CSP(3); bottom-up stride-2
convs + concat + CSP(3). Exposes `out_channels`.

Deviation (documented): the reference re-applies width_multiple to channel counts that
are already width-scaled by the backbone, which crashes for any width != 1.0
(detector.py:165-188 — fpn_conv4 expects scaled(c4)*2 inputs but receives
scaled(c4)+c4). Here the channel graph is defined purely by the real `in_channels`
(identical to the reference for width 1.0, the only configuration where it runs), so
every s/m/l variant works.

Reference quirks preserved for parity: the top-down laterals are computed from the RAW
p4/p5 (not the processed maps, detector.py:210-211), and the bottom-up P5 concat uses
the RAW p5 (detector.py:228).
"""
from __future__ import annotations

from typing import Any, List, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from .blocks import ConvBlock, CSPBlock


def upsample_nearest_2x(x):
    """NHWC nearest-neighbor 2x upsample (matches F.interpolate mode='nearest')."""
    B, H, W, C = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (B, H, 2, W, 2, C))
    return x.reshape(B, H * 2, W * 2, C)


class FeatureNeck(nn.Module):
    """FPN top-down + PAN bottom-up fusion over [P3, P4, P5]."""

    in_channels: Sequence[int]
    dtype: Any = jnp.float32
    # rematerialize the fusion CSP blocks in the backward pass (see CSPDarknet)
    remat: bool = False
    # serving-path merged cv1+cv2 split convs (see CSPBlock.merged_cv12)
    merged_csp: bool = False
    # serving-path W-pair packed bottleneck chains (see CSPBlock.packed_m)
    packed_m_csp: bool = False

    @property
    def out_channels(self) -> List[int]:
        return list(self.in_channels)

    @nn.compact
    def __call__(self, features, train: bool = False) -> List[jnp.ndarray]:
        CSP = nn.remat(CSPBlock, static_argnums=(2,)) if self.remat else CSPBlock
        p3, p4, p5 = features
        c3, c4, c5 = self.in_channels

        # Top-down path
        p5_td = ConvBlock(c4, 1, 1, dtype=self.dtype, name="lateral5")(p5, train)
        p4_td = ConvBlock(c3, 1, 1, dtype=self.dtype, name="lateral4")(p4, train)

        p4_merged = jnp.concatenate([upsample_nearest_2x(p5_td), p4], axis=-1)
        p4_processed = CSP(c4, 3, dtype=self.dtype, merged_cv12=self.merged_csp,
                           packed_m=self.packed_m_csp,
                           name="fpn4")(p4_merged, train)

        p3_merged = jnp.concatenate([upsample_nearest_2x(p4_td), p3], axis=-1)
        p3_processed = CSP(c3, 3, dtype=self.dtype, merged_cv12=self.merged_csp, packed_m=self.packed_m_csp,
                           name="fpn3")(p3_merged, train)

        # Bottom-up path
        p3_down = ConvBlock(c3, 3, 2, dtype=self.dtype, name="down3")(p3_processed, train)
        p4_out = CSP(c4, 3, dtype=self.dtype, merged_cv12=self.merged_csp, packed_m=self.packed_m_csp,
                     name="pan4")(
            jnp.concatenate([p3_down, p4_processed], axis=-1), train
        )

        p4_down = ConvBlock(c4, 3, 2, dtype=self.dtype, name="down4")(p4_out, train)
        p5_out = CSP(c5, 3, dtype=self.dtype, merged_cv12=self.merged_csp, packed_m=self.packed_m_csp,
                     name="pan5")(
            jnp.concatenate([p4_down, p5], axis=-1), train
        )

        return [p3_processed, p4_out, p5_out]
