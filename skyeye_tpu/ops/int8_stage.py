"""Int8 post-training-quantized early backbone (serving-only).

Why: the round-2 on-chip profile shows the serving pipeline is dominated by the
early backbone convs (67% of time, HBM-BOUND at 64-128 channels @1280px). Int8
activations halve the inter-layer HBM traffic and the v5e MXU runs s8xs8->s32
at 2x bf16 throughput — measured 1.27x on the whole stem->csp2 stage
(tools/quant_stage_bench.py). The reference has no quantization story
(/root/reference has no quant code at all); this is a TPU-native serving mode.

Scheme: symmetric int8, per-output-channel weight scales, static per-tensor
activation scales calibrated offline (ops/calibrate.observe_ranges on the
packed-stem serving model). Each conv runs s8 x s8 -> s32 on the MXU, the f32
epilogue applies (in_scale * w_scale) + bias and SiLU, then requantizes to the
consumer's activation scale — so every tensor STORED between layers is int8.
Residual adds and the CSP concat happen in the f32 epilogue against
dequantized operands, exactly once per tensor.

Wiring: `CSPDarknet(int8_early=True, packed_stem=True)` swaps stages 1-2
(stem -> csp2 == P3) for `Int8EarlyStage`; `quantize_early_variables` builds
its parameters from BN-folded + stem-packed canonical variables plus the
calibration ranges. Stages 3-4 and the neck/head stay bf16 (deep stages are
MXU-bound, where bf16 is already optimal).
"""
from __future__ import annotations

from typing import Any, Dict

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

_DN = (("NHWC", "HWIO", "NHWC"))


def _conv_dn(lhs_shape_dummy=None):
    return jax.lax.conv_dimension_numbers((1, 1, 1, 1), (1, 1, 1, 1), _DN)


def quant_int8(x, scale):
    """f32 -> int8 with symmetric per-tensor scale."""
    return jnp.clip(jnp.round(x / scale), -127, 127).astype(jnp.int8)


def _qconv(x_q, k_q, in_scale, w_scale, bias, *, stride=1, padding,
           out_scale=None, residual_q=None, residual_scale=None):
    """int8 conv + f32 epilogue (dequant -> bias -> SiLU [-> +residual]) ->
    requant to out_scale (or bf16 when out_scale is None)."""
    y = jax.lax.conv_general_dilated(
        x_q, k_q, (stride, stride), padding, dimension_numbers=_conv_dn(),
        preferred_element_type=jnp.int32,
    )
    y = y.astype(jnp.float32) * (in_scale * w_scale)[None, None, None, :]
    y = y + bias[None, None, None, :]
    y = y * jax.nn.sigmoid(y)  # SiLU
    if residual_q is not None:
        y = y + residual_q.astype(jnp.float32) * residual_scale
    if out_scale is None:
        return y.astype(jnp.bfloat16)
    return quant_int8(y, out_scale)


class Int8EarlyStage(nn.Module):
    """Stages 1-2 of the packed-stem serving backbone in int8.

    Input: packed (B, S/4, S/4, 48) bf16 in [0, 1]. Output: P3 feature map
    (B, S/8, S/8, c3) bf16. Parameters come from `quantize_early_variables`.
    """

    c1: int  # base width (stem emits 4*c1 in the s2d domain)
    c2: int
    c3: int
    nb1: int
    nb2: int
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        assert not train, "Int8EarlyStage is a serving-only path"
        z = nn.initializers.zeros

        def conv_params(name, kh, kw, cin, cout):
            return (
                self.param(f"{name}_k", z, (kh, kw, cin, cout), jnp.int8),
                self.param(f"{name}_ws", z, (cout,), jnp.float32),
                self.param(f"{name}_b", z, (cout,), jnp.float32),
            )

        def scale(name):
            return self.param(f"s_{name}", z, (), jnp.float32)

        specs = _conv_specs(self.c1, self.c2, self.c3, self.nb1, self.nb2)
        P = {name: conv_params(name, *spec[:4]) for name, spec in specs.items()}
        S = {t: scale(t) for t in _tensor_names(self.nb1, self.nb2)}

        xq = quant_int8(x.astype(jnp.float32), S["x"])

        def run(name, x_q, in_s, out_s, residual_q=None, residual_scale=None):
            kh, kw, cin, cout, stride, pad = specs[name]
            k_q, ws, b = P[name]
            return _qconv(x_q, k_q, in_s, ws, b, stride=stride, padding=pad,
                          out_scale=out_s, residual_q=residual_q,
                          residual_scale=residual_scale)

        t = run("stem", xq, S["x"], S["stem"])
        t = run("down1", t, S["stem"], S["down1"])

        def csp(prefix, x_q, in_s, nb, cat_s, out_s):
            y1 = run(f"{prefix}_cv1", x_q, in_s, S[f"{prefix}_cv1"])
            y1_s = S[f"{prefix}_cv1"]
            for i in range(nb):
                a = run(f"{prefix}_m{i}_cv1", y1, y1_s, S[f"{prefix}_m{i}_cv1"])
                next_s = cat_s if i == nb - 1 else S[f"{prefix}_m{i}"]
                y1 = run(f"{prefix}_m{i}_cv2", a, S[f"{prefix}_m{i}_cv1"],
                         next_s, residual_q=y1, residual_scale=y1_s)
                y1_s = next_s
            y2 = run(f"{prefix}_cv2", x_q, in_s, cat_s)
            cat = jnp.concatenate([y1, y2], axis=-1)
            return run(f"{prefix}_cv3", cat, cat_s, out_s)

        t = csp("c1", t, S["down1"], self.nb1, S["c1_cat"], S["c1"])
        t = run("down2", t, S["c1"], S["down2"])
        out = csp("c2", t, S["down2"], self.nb2, S["c2_cat"], None)
        return out.astype(self.dtype)


def _conv_specs(c1, c2, c3, nb1, nb2) -> Dict[str, tuple]:
    """name -> (kh, kw, cin, cout, stride, padding)."""
    h1, h2 = c2 // 2, c3 // 2
    p1 = ((1, 1), (1, 1))
    p0 = ((0, 0), (0, 0))
    specs = {
        "stem": (3, 3, 48, 4 * c1, 1, p1),
        "down1": (2, 2, 4 * c1, c2, 1, ((1, 0), (1, 0))),
        "c1_cv1": (1, 1, c2, h1, 1, p0),
        "c1_cv2": (1, 1, c2, h1, 1, p0),
        "c1_cv3": (1, 1, 2 * h1, c2, 1, p0),
        "down2": (3, 3, c2, c3, 2, p1),
        "c2_cv1": (1, 1, c3, h2, 1, p0),
        "c2_cv2": (1, 1, c3, h2, 1, p0),
        "c2_cv3": (1, 1, 2 * h2, c3, 1, p0),
    }
    for i in range(nb1):
        specs[f"c1_m{i}_cv1"] = (1, 1, h1, h1, 1, p0)
        specs[f"c1_m{i}_cv2"] = (3, 3, h1, h1, 1, p1)
    for i in range(nb2):
        specs[f"c2_m{i}_cv1"] = (1, 1, h2, h2, 1, p0)
        specs[f"c2_m{i}_cv2"] = (3, 3, h2, h2, 1, p1)
    return specs


def _tensor_names(nb1, nb2):
    names = ["x", "stem", "down1", "c1_cv1", "c1_cat", "c1", "down2",
             "c2_cv1", "c2_cat"]
    for i in range(nb1):
        names += [f"c1_m{i}_cv1"] + ([f"c1_m{i}"] if i < nb1 - 1 else [])
    for i in range(nb2):
        names += [f"c2_m{i}_cv1"] + ([f"c2_m{i}"] if i < nb2 - 1 else [])
    return names


# calibration-path mapping: which captured intermediate feeds each tensor scale
def _range_key_map(nb1, nb2) -> Dict[str, Any]:
    m = {
        "x": None,  # packed input in [0,1]
        "stem": "backbone/stem",
        "down1": "backbone/down1",
        "c1_cv1": "backbone/csp1/cv1",
        "c1_cat": ("max", f"backbone/csp1/m{nb1-1}", "backbone/csp1/cv2"),
        "c1": "backbone/csp1",
        "down2": "backbone/down2",
        "c2_cv1": "backbone/csp2/cv1",
        "c2_cat": ("max", f"backbone/csp2/m{nb2-1}", "backbone/csp2/cv2"),
    }
    for i in range(nb1):
        m[f"c1_m{i}_cv1"] = f"backbone/csp1/m{i}/cv1"
        if i < nb1 - 1:
            m[f"c1_m{i}"] = f"backbone/csp1/m{i}"
    for i in range(nb2):
        m[f"c2_m{i}_cv1"] = f"backbone/csp2/m{i}/cv1"
        if i < nb2 - 1:
            m[f"c2_m{i}"] = f"backbone/csp2/m{i}"
    return m


def quantize_early_variables(variables, ranges: Dict[str, Dict[str, float]],
                             config, stat: str = "pctl") -> Dict:
    """Build Int8EarlyStage parameters from BN-folded + stem-packed canonical
    variables and calibration ranges (ops/calibrate.observe_ranges on the
    packed-stem model).

    Returns new variables with backbone params {stem, down1, csp1, csp2}
    replaced by one flat "int8_early" subtree; deeper stages pass through.
    """
    import copy

    from .calibrate import quantize_weight_per_channel, symmetric_scale
    from ..models.backbone import scaled_channels, scaled_depth

    c1 = scaled_channels(config.base_channels, config.width_multiple)
    c2 = scaled_channels(config.base_channels * 2, config.width_multiple)
    c3 = scaled_channels(config.base_channels * 4, config.width_multiple)
    nb1 = scaled_depth(3, config.depth_multiple)
    nb2 = scaled_depth(9, config.depth_multiple)

    params = copy.deepcopy(jax.tree_util.tree_map(np.asarray, variables["params"]))
    stats = copy.deepcopy(
        jax.tree_util.tree_map(np.asarray, variables.get("batch_stats", {}))
    )
    bb = params["backbone"]

    def folded(node, where):
        from .fused_csp import _require_identity_bn

        _require_identity_bn(node["bn"], {"mean": 0.0}, where)
        return np.asarray(node["conv"]["kernel"]), np.asarray(node["bn"]["bias"])

    src = {
        "stem": folded(bb["stem"], "stem"),
        "down1": folded(bb["down1"], "down1"),
        "down2": folded(bb["down2"], "down2"),
    }
    for pfx, blk, nb in (("c1", "csp1", nb1), ("c2", "csp2", nb2)):
        node = bb[blk]
        src[f"{pfx}_cv1"] = folded(node["cv1"], f"{blk}/cv1")
        src[f"{pfx}_cv2"] = folded(node["cv2"], f"{blk}/cv2")
        src[f"{pfx}_cv3"] = folded(node["cv3"], f"{blk}/cv3")
        for i in range(nb):
            src[f"{pfx}_m{i}_cv1"] = folded(node[f"m{i}"]["cv1"], f"{blk}/m{i}/cv1")
            src[f"{pfx}_m{i}_cv2"] = folded(node[f"m{i}"]["cv2"], f"{blk}/m{i}/cv2")

    flat = {}
    for name, (k, b) in src.items():
        kq, ws = quantize_weight_per_channel(k)
        flat[f"{name}_k"] = kq
        flat[f"{name}_ws"] = ws
        flat[f"{name}_b"] = np.asarray(b, np.float32)

    key_map = _range_key_map(nb1, nb2)
    for tensor, key in key_map.items():
        if key is None:
            absmax = 1.0
        elif isinstance(key, tuple):
            absmax = max(ranges[k][stat] for k in key[1:])
        else:
            absmax = ranges[key][stat]
        flat[f"s_{tensor}"] = np.float32(symmetric_scale(absmax))

    for gone in ("stem", "down1", "csp1", "down2", "csp2"):
        del params["backbone"][gone]
        stats.get("backbone", {}).pop(gone, None)
    params["backbone"]["int8_early"] = flat
    return {"params": params, "batch_stats": stats}
