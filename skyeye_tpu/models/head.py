"""Anchor-based detection head and the pure-function anchor decode.

Capability parity (reference /root/reference/skyeye/core/models/detector.py:18-145):
per-level 1x1 conv -> (B, na, H, W, nc+5) raw logits; inference decode applies sigmoid
then xy = (2*sig - 0.5 + grid) * stride, wh = (2*sig)^2 * anchor * stride
(detector.py:119-121,137-138 — anchors are grid-unit values scaled by the level
stride), concatenating all levels to (B, sum(na*H*W), nc+5).

TPU-native notes:
  * Native layout is NHWC: raw head output per level is (B, H, W, na, no); helpers
    convert to the reference's (B, na, H, W, no) only at the converter boundary.
  * `decode_predictions` is a pure jit-safe function with static shapes — grids are
    compile-time iotas, the concat is one fused launch, and the output feeds the
    fixed-shape NMS directly so the whole image-in/boxes-out path stays on device.
  * TransformerLayer-enhanced head variant (`transformer_heads`): the reference ships
    TransformerLayer as an unused library component (attention.py:244-309, SURVEY.md
    M11); here it is wired as an optional pre-head refinement on P5 (the smallest
    grid, where global attention is affordable), fulfilling the "transformer-enhanced
    prediction heads" capability in BASELINE.json.
"""
from __future__ import annotations

from typing import Any, List, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from .attention import TransformerLayer


class DetectionHead(nn.Module):
    """Per-level 1x1 prediction convs -> (B, H, W, na, nc+5) raw logits."""

    num_classes: int
    num_anchors: int = 3
    num_levels: int = 3
    transformer_heads: bool = False
    transformer_num_heads: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, features, train: bool = False) -> List[jnp.ndarray]:
        no = self.num_classes + 5
        outputs = []
        for i, feat in enumerate(features):
            if self.transformer_heads and i == len(features) - 1:
                feat = TransformerLayer(
                    num_heads=self.transformer_num_heads,
                    dtype=self.dtype,
                    name=f"transformer{i}",
                )(feat, train)
            x = nn.Conv(
                self.num_anchors * no,
                (1, 1),
                dtype=self.dtype,
                param_dtype=jnp.float32,
                name=f"pred{i}",
            )(feat)
            B, H, W, _ = x.shape
            outputs.append(x.reshape(B, H, W, self.num_anchors, no))
        return outputs


def decode_predictions(
    outputs: Sequence[jnp.ndarray],
    anchors,
    input_shape: Tuple[int, int],
    anchor_major: bool = True,
) -> jnp.ndarray:
    """Decode raw per-level logits into (B, N, nc+5) boxes+scores.

    Args:
      outputs: list of (B, H, W, na, nc+5) raw logits (NHWC-native head output).
      anchors: (nl, na, 2) grid-unit anchors.
      input_shape: (in_h, in_w) of the network input, for stride derivation
        (reference computes stride = max(in_h/grid_h, in_w/grid_w), detector.py:107-109).
      anchor_major: emit rows in the reference's (B, na, H, W) order (a relayout
        of ~75 MB at 1280 b16). Row order is irrelevant to NMS, so serving
        pipelines pass False and skip the transpose; keep True wherever outputs
        are compared index-wise against the reference.

    Returns decoded (B, sum(na*H*W), nc+5): xywh in input pixels, sigmoided obj/cls.
    """
    anchors = jnp.asarray(anchors, jnp.float32)
    in_h, in_w = input_shape
    decoded = []
    for i, out in enumerate(outputs):
        B, H, W, na, no = out.shape
        stride = max(in_h / H, in_w / W)

        out = jax.nn.sigmoid(out.astype(jnp.float32))
        gx = jax.lax.broadcasted_iota(jnp.float32, (H, W), 1)
        gy = jax.lax.broadcasted_iota(jnp.float32, (H, W), 0)
        grid = jnp.stack([gx, gy], axis=-1)[:, :, None, :]  # (H, W, 1, 2)

        xy = (out[..., 0:2] * 2.0 - 0.5 + grid) * stride
        wh = (out[..., 2:4] * 2.0) ** 2 * (anchors[i][None, None, :, :] * stride)
        rest = out[..., 4:]
        dec = jnp.concatenate([xy, wh, rest], axis=-1)
        if anchor_major:
            # anchor-major flatten to match the reference's (B, na, H, W, no) ->
            # (B, na*H*W, no) ordering exactly (detector.py:140-141)
            dec = jnp.transpose(dec, (0, 3, 1, 2, 4))
        decoded.append(dec.reshape(B, na * H * W, no))
    return jnp.concatenate(decoded, axis=1)


def to_reference_layout(outputs: Sequence[jnp.ndarray]) -> List[jnp.ndarray]:
    """(B, H, W, na, no) -> reference's (B, na, H, W, no) (detector.py:80-82)."""
    return [jnp.transpose(o, (0, 3, 1, 2, 4)) for o in outputs]
