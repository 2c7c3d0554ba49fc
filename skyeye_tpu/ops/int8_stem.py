"""Int8 serving stem: the packed stem conv on the 2x int8 MXU path, exactly.

Why: the round-4 per-op attribution (profiles/r4s4_1280_barrier) pins the
largest single conv residue on the stem — 1.90 ms vs a 0.61 ms HBM floor
@1280 b16, with ~0.92 ms against its bf16 MXU floor because XLA's emitter
convolves the uint8 input operand directly (per-tile converts at half MXU
efficiency). Materializing a bf16 input costs more than it saves (stembf16
A/B: −4.9%, profiles/ab_serving_auto_r4s5.log). The int8 route attacks the
compute side instead: the serving input is ALREADY uint8, so quantizing the
activation is free AND exact — only the weights quantize (symmetric s8,
per-output-channel scales), and the v5e MXU runs s8×s8→s32 at 394 TF/s
(2× bf16).

uint8 trick: the MXU path wants signed operands, so the input shifts to
s8 = u8 − 128 and the epilogue adds back the EXACT correction
128·Σ_{valid taps} k_deq — constant per output channel in the interior and
varying only on the 1-pixel border ring (3×3 conv, SAME padding), so it is
applied as 9 per-channel tap-sum vectors combined under iota border masks:
pure fused elementwise in the epilogue, no extra HBM traffic.

The ONLY approximation vs the bf16 stem is weight quantization (the input
path is bit-exact); everything downstream stays bf16. The reference has no
quantization story at all (no quant code anywhere in /root/reference); its
stem is the Focus block (/root/reference/skyeye/core/models/blocks.py:152-182).
"""
from __future__ import annotations

from typing import Any, Dict

import numpy as np

import flax.linen as nn
import jax
import jax.numpy as jnp


class Int8PackedStem(nn.Module):
    """Serving-only packed stem conv (3x3/1 on the s2d4 input) in int8.

    Input: uint8 (B, H/4, W/4, 16C) s2d4-packed frames (the f32/bf16
    [0, 255] range is also accepted for equivalence tests — it rounds to the
    same integers). Output: bf16 (B, H/4, W/4, out_channels), identical to
    conv+fused-BN+SiLU up to weight quantization. Params come from
    `quantize_stem_variables`.
    """

    out_channels: int
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        assert not train, "Int8PackedStem is a serving-only path"
        z = nn.initializers.zeros
        cin, cout = x.shape[-1], self.out_channels
        kq = self.param("kernel_q", z, (3, 3, cin, cout), jnp.int8)
        ws = self.param("w_scale", z, (cout,), jnp.float32)
        bias = self.param("bias", z, (cout,), jnp.float32)
        # tap_sums[r, s, o] = 128 * sum_c (kq[r,s,c,o] * ws[o]) — the exact
        # +128 shift correction contribution of tap (r, s)
        taps = self.param("tap_sums", z, (3, 3, cout), jnp.float32)

        if x.dtype == jnp.uint8:
            xq = (x.astype(jnp.int16) - 128).astype(jnp.int8)
        else:  # test path: float values that ARE integers in [0, 255]
            xq = (jnp.round(x.astype(jnp.float32)) - 128.0).astype(jnp.int8)
        y = jax.lax.conv_general_dilated(
            xq, kq, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32,
        )
        y = y.astype(jnp.float32) * ws[None, None, None, :]

        # exact border-aware +128 correction: tap (r, s) contributes at output
        # (h, w) iff its input row/col lands inside the image (SAME padding)
        _, H, W, _ = y.shape
        h = jax.lax.broadcasted_iota(jnp.int32, (1, H, 1, 1), 1)
        w = jax.lax.broadcasted_iota(jnp.int32, (1, 1, W, 1), 2)
        top, bot = h == 0, h == H - 1
        left, right = w == 0, w == W - 1
        t = taps
        corr = (
            t.sum((0, 1))
            - jnp.where(top, t[0].sum(0), 0.0)
            - jnp.where(bot, t[2].sum(0), 0.0)
            - jnp.where(left, t[:, 0].sum(0), 0.0)
            - jnp.where(right, t[:, 2].sum(0), 0.0)
            + jnp.where(top & left, t[0, 0], 0.0)
            + jnp.where(top & right, t[0, 2], 0.0)
            + jnp.where(bot & left, t[2, 0], 0.0)
            + jnp.where(bot & right, t[2, 2], 0.0)
        )
        y = y + corr + bias[None, None, None, :]
        y = y * jax.nn.sigmoid(y)  # SiLU
        return y.astype(self.dtype)


def quantize_stem_variables(variables: Dict) -> Dict:
    """Rewrite the SERVING stem subtree (post fuse_conv_bn + pack_stem +
    fold_input_scale) into Int8PackedStem parameters.

    Reads params.backbone.stem = {conv: {kernel (3,3,cin,cout)}, bn: {bias}}
    (BN already folded to identity-with-bias) and replaces it with
    {kernel_q, w_scale, bias, tap_sums}; the stem's identity batch_stats
    entry is dropped.
    """
    import copy

    params = copy.deepcopy(jax.tree_util.tree_map(np.asarray, variables["params"]))
    stats = copy.deepcopy(
        jax.tree_util.tree_map(np.asarray, variables.get("batch_stats", {}))
    )
    stem = params["backbone"]["stem"]
    k = np.asarray(stem["conv"]["kernel"], np.float32)
    bias = np.asarray(stem["bn"]["bias"], np.float32)
    assert np.allclose(np.asarray(stem["bn"]["scale"], np.float32), 1.0), (
        "quantize_stem_variables expects fuse_conv_bn to have run first"
    )
    ws = np.abs(k).reshape(-1, k.shape[-1]).max(0) / 127.0
    ws = np.where(ws == 0.0, 1.0, ws).astype(np.float32)
    kq = np.clip(np.round(k / ws), -127, 127).astype(np.int8)
    k_deq = kq.astype(np.float32) * ws
    taps = 128.0 * k_deq.sum(axis=2)  # (3, 3, cout)
    params["backbone"]["stem"] = {
        "kernel_q": kq,
        "w_scale": ws,
        "bias": bias.astype(np.float32),
        "tap_sums": taps.astype(np.float32),
    }
    stats.get("backbone", {}).pop("stem", None)
    out = {"params": params}
    if "batch_stats" in variables:
        out["batch_stats"] = stats
    return out
