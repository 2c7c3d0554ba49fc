"""Int8 serving neck: every FPN/PAN conv on the 2x int8 MXU path.

Why: round-4 unit measurement (profiles/int8_deep_bench.json) found the
neck-class shapes — 256/512-channel convs at 80/40 px grids — run 1.28x
faster as s8xs8->s32 than bf16 (short requant chains, wide channels), while
the deep backbone stages are neutral (1.03x) and the early stages lose.
This wires that unit win end-to-end: the three backbone feature maps
quantize once (static per-tensor scales calibrated offline via
ops/calibrate.observe_ranges), every tensor BETWEEN neck convs is stored
int8, and the three head inputs dequantize back to bf16. Scheme and helper
(_qconv: int8 conv + f32 dequant->bias->SiLU epilogue -> requant) shared
with ops/int8_stage.py.

Mirrors models/neck.py::FeatureNeck exactly (same conv graph, same
reference quirks: laterals from RAW p4/p5, pan5 concat uses RAW p5 —
/root/reference/skyeye/core/models/detector.py:148-231); the only
approximations vs bf16 are weight quantization and the calibrated
activation requants, gated by mAP (tools/int8_serving_gate.py).
"""
from __future__ import annotations

from typing import Any, Dict, Sequence

import numpy as np

import flax.linen as nn
import jax
import jax.numpy as jnp

from .int8_stage import _qconv, quant_int8
from ..models.neck import upsample_nearest_2x


def _neck_specs(c3: int, c4: int, c5: int, nb: int) -> Dict[str, tuple]:
    """name -> (kh, kw, cin, cout, stride, padding); mirrors FeatureNeck."""
    p1 = ((1, 1), (1, 1))
    p0 = ((0, 0), (0, 0))
    specs = {
        "lateral5": (1, 1, c5, c4, 1, p0),
        "lateral4": (1, 1, c4, c3, 1, p0),
        "down3": (3, 3, c3, c3, 2, p1),
        "down4": (3, 3, c4, c4, 2, p1),
    }
    for name, cin, cout in (("fpn4", 2 * c4, c4), ("fpn3", 2 * c3, c3),
                            ("pan4", c3 + c4, c4), ("pan5", c4 + c5, c5)):
        h = cout // 2
        specs[f"{name}_cv1"] = (1, 1, cin, h, 1, p0)
        specs[f"{name}_cv2"] = (1, 1, cin, h, 1, p0)
        specs[f"{name}_cv3"] = (1, 1, 2 * h, cout, 1, p0)
        for i in range(nb):
            specs[f"{name}_m{i}_cv1"] = (1, 1, h, h, 1, p0)
            specs[f"{name}_m{i}_cv2"] = (3, 3, h, h, 1, p1)
    return specs


def _tensor_names(nb: int):
    """Every int8-stored tensor needing a static activation scale."""
    names = ["x3", "x4", "x5", "pan4_in", "pan5_in", "fpn3", "pan4"]
    for n in ("fpn4", "fpn3", "pan4", "pan5"):
        names += [f"{n}_cv1", f"{n}_cat"]
        for i in range(nb):
            names += [f"{n}_m{i}_cv1"] + ([f"{n}_m{i}"] if i < nb - 1 else [])
    return names


def _range_key_map(nb: int) -> Dict[str, Any]:
    """tensor scale -> captured canonical-module path(s) (ops/calibrate)."""
    m = {
        "x5": "backbone/spp4",
        # shared concat scales: both concat operands requantize to one scale
        "x4": ("max", "backbone/cbam3", "neck/lateral5"),
        "x3": ("max", "backbone/csp2", "neck/lateral4"),
        "pan4_in": ("max", "neck/down3", "neck/fpn4"),
        "pan5_in": ("max", "neck/down4", "backbone/spp4"),
        "fpn3": "neck/fpn3",
        "pan4": "neck/pan4",
    }
    for n in ("fpn4", "fpn3", "pan4", "pan5"):
        m[f"{n}_cv1"] = f"neck/{n}/cv1"
        m[f"{n}_cat"] = ("max", f"neck/{n}/m{nb-1}", f"neck/{n}/cv2")
        for i in range(nb):
            m[f"{n}_m{i}_cv1"] = f"neck/{n}/m{i}/cv1"
            if i < nb - 1:
                m[f"{n}_m{i}"] = f"neck/{n}/m{i}"
    return m


class Int8Neck(nn.Module):
    """FeatureNeck in int8 (serving-only). Inputs/outputs bf16; everything
    between neck convs stored int8. Parameters from quantize_neck_variables."""

    in_channels: Sequence[int]
    num_blocks: int
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, features, train: bool = False):
        assert not train, "Int8Neck is a serving-only path"
        z = nn.initializers.zeros
        c3, c4, c5 = self.in_channels
        nb = self.num_blocks
        specs = _neck_specs(c3, c4, c5, nb)
        P = {
            name: (
                self.param(f"{name}_k", z, (kh, kw, cin, cout), jnp.int8),
                self.param(f"{name}_ws", z, (cout,), jnp.float32),
                self.param(f"{name}_b", z, (cout,), jnp.float32),
            )
            for name, (kh, kw, cin, cout, _, _) in specs.items()
        }
        S = {t: self.param(f"s_{t}", z, (), jnp.float32)
             for t in _tensor_names(nb)}

        def run(name, x_q, in_s, out_s, residual_q=None, residual_scale=None):
            _, _, _, _, stride, pad = specs[name]
            k_q, ws, b = P[name]
            return _qconv(x_q, k_q, in_s, ws, b, stride=stride, padding=pad,
                          out_scale=out_s, residual_q=residual_q,
                          residual_scale=residual_scale)

        def csp(prefix, x_q, in_s, out_s):
            y1 = run(f"{prefix}_cv1", x_q, in_s, S[f"{prefix}_cv1"])
            y1_s = S[f"{prefix}_cv1"]
            cat_s = S[f"{prefix}_cat"]
            for i in range(nb):
                a = run(f"{prefix}_m{i}_cv1", y1, y1_s, S[f"{prefix}_m{i}_cv1"])
                next_s = cat_s if i == nb - 1 else S[f"{prefix}_m{i}"]
                y1 = run(f"{prefix}_m{i}_cv2", a, S[f"{prefix}_m{i}_cv1"],
                         next_s, residual_q=y1, residual_scale=y1_s)
                y1_s = next_s
            y2 = run(f"{prefix}_cv2", x_q, in_s, cat_s)
            cat = jnp.concatenate([y1, y2], axis=-1)
            return run(f"{prefix}_cv3", cat, cat_s, out_s)

        p3, p4, p5 = features
        q5 = quant_int8(p5.astype(jnp.float32), S["x5"])
        lat5 = run("lateral5", q5, S["x5"], S["x4"])
        q4 = quant_int8(p4.astype(jnp.float32), S["x4"])
        m4 = jnp.concatenate([upsample_nearest_2x(lat5), q4], axis=-1)
        lat4 = run("lateral4", q4, S["x4"], S["x3"])
        q3 = quant_int8(p3.astype(jnp.float32), S["x3"])
        m3 = jnp.concatenate([upsample_nearest_2x(lat4), q3], axis=-1)

        p4p = csp("fpn4", m4, S["x4"], S["pan4_in"])
        p3p = csp("fpn3", m3, S["x3"], S["fpn3"])

        p3_out = (p3p.astype(jnp.float32) * S["fpn3"]).astype(self.dtype)
        d3 = run("down3", p3p, S["fpn3"], S["pan4_in"])
        p4o = csp("pan4", jnp.concatenate([d3, p4p], axis=-1),
                  S["pan4_in"], S["pan4"])
        p4_out = (p4o.astype(jnp.float32) * S["pan4"]).astype(self.dtype)
        d4 = run("down4", p4o, S["pan4"], S["pan5_in"])
        # reference quirk preserved: the pan5 concat uses the RAW p5
        q5b = quant_int8(p5.astype(jnp.float32), S["pan5_in"])
        p5_out = csp("pan5", jnp.concatenate([d4, q5b], axis=-1),
                     S["pan5_in"], None).astype(self.dtype)
        return [p3_out, p4_out, p5_out]


def quantize_neck_variables(variables, ranges: Dict[str, Dict[str, float]],
                            config, stat: str = "pctl") -> Dict:
    """Build Int8Neck parameters from BN-folded canonical variables (BEFORE
    any merged-cv12 rewrite) and calibration ranges. Replaces params["neck"]
    with the flat int8 tree and drops the neck's identity batch_stats."""
    import copy

    from .calibrate import quantize_weight_per_channel, symmetric_scale
    from .fused_csp import _require_identity_bn
    from ..models.backbone import feature_channels

    c3, c4, c5 = feature_channels(config.base_channels, config.width_multiple)
    nb = 3  # FeatureNeck hardcodes 3 bottlenecks per CSP (not depth-scaled)

    params = copy.deepcopy(jax.tree_util.tree_map(np.asarray, variables["params"]))
    stats = copy.deepcopy(
        jax.tree_util.tree_map(np.asarray, variables.get("batch_stats", {}))
    )
    neck = params["neck"]

    def folded(node, where):
        _require_identity_bn(node["bn"], {"mean": 0.0}, where)
        return np.asarray(node["conv"]["kernel"]), np.asarray(node["bn"]["bias"])

    src = {n: folded(neck[n], n)
           for n in ("lateral5", "lateral4", "down3", "down4")}
    for blk in ("fpn4", "fpn3", "pan4", "pan5"):
        node = neck[blk]
        for cv in ("cv1", "cv2", "cv3"):
            src[f"{blk}_{cv}"] = folded(node[cv], f"{blk}/{cv}")
        for i in range(nb):
            src[f"{blk}_m{i}_cv1"] = folded(node[f"m{i}"]["cv1"], f"{blk}/m{i}/cv1")
            src[f"{blk}_m{i}_cv2"] = folded(node[f"m{i}"]["cv2"], f"{blk}/m{i}/cv2")

    flat = {}
    for name, (k, b) in src.items():
        kq, ws = quantize_weight_per_channel(k)
        flat[f"{name}_k"] = kq
        flat[f"{name}_ws"] = ws
        flat[f"{name}_b"] = np.asarray(b, np.float32)

    for tensor, key in _range_key_map(nb).items():
        if isinstance(key, tuple):
            absmax = max(ranges[k][stat] for k in key[1:])
        else:
            absmax = ranges[key][stat]
        flat[f"s_{tensor}"] = np.float32(symmetric_scale(absmax))

    params["neck"] = flat
    stats.pop("neck", None)
    out = {"params": params}
    if "batch_stats" in variables:
        out["batch_stats"] = stats
    return out
