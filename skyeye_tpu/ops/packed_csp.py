"""Packed-domain stage 1: run csp1 + down2 in a 2x2 space-to-depth layout.

Why (measured, profiles/r3_1280/hlo_stats_summary.json, v5e @1280 b16): stage-1
tensors are (B, 320, 320, 32..64) — the channel minor dim occupies 32..64 of the
128 TPU lanes, so every HBM round trip pays 2-4x its logical bytes in tile
padding and every MXU pass contracts over a quarter-full lane dim. The single
3x3 32->32 bottleneck conv measures 3.12 ms against a 0.26 ms roofline (12x).
The reference hits the same physics on CUDA and leaves it on the table
(/root/reference/skyeye/core/models/blocks.py:93-123).

TPU-native fix, extending the packed-stem idea (ops/packed_stem.py): keep the
whole stage in a 2x2-s2d packed layout (B, 160, 160, 4C) — channel dim >= 128,
zero padding waste — with EXACT weight remapping:

  * 1x1 conv (ci -> co)      == dense 1x1 (4ci -> 4co), phase-block-diagonal
    (4x nominal FLOPs from structured zeros, but these shapes are HBM-bound:
    the MXU time is free and the HBM time drops 2-4x);
  * 3x3/1 conv (ci -> co)    == 3x3/1 (4ci -> 4co): output phase (a, b) tap
    (r, s) reads input phase ((a+r-1) mod 2, (b+s-1) mod 2) at packed offset
    (floor((a+r-1)/2), floor((b+s-1)/2));
  * csp cv1 + cv2 (same input) merge into ONE dense 1x1 (4ci -> 8h): one HBM
    pass over the stage input instead of two;
  * the concat [y1, y2] -> cv3 channel permutation is folded into cv3's packed
    kernel (zero data movement);
  * down2 3x3/2 (c2 -> c3)   == 2x2/1 (4c2 -> c3) pad ((1,0),(1,0)) consuming
    the packed layout and emitting the canonical (B, 160, 160, c3) tensor —
    everything downstream is unchanged (same derivation as pack_down1_kernel).

BatchNorm/SiLU are per-channel/elementwise and commute with the packing: BN
params tile 4x phase-major, so the transform works on raw or fuse_conv_bn'd
variables. Equivalence vs the canonical stage is asserted in
tests/test_packed_csp.py.
"""
from __future__ import annotations

from typing import Any, Dict

import numpy as np

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..models.blocks import ConvBlock


def s2d2_device(x: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W, C) -> (B, H/2, W/2, 4C), channel (dy*2+dx)*C + c (phase-major)."""
    B, H, W, C = x.shape
    y = x.reshape(B, H // 2, 2, W // 2, 2, C)
    y = jnp.moveaxis(y, 2, 3)  # (B, H/2, W/2, 2, 2, C)
    return y.reshape(B, H // 2, W // 2, 4 * C)


def pack_1x1_kernel(k: np.ndarray, phases: int = 4) -> np.ndarray:
    """(1, 1, ci, co) -> (1, 1, phases*ci, phases*co) phase-block-diagonal."""
    k = np.asarray(k)
    assert k.shape[:2] == (1, 1), k.shape
    ci, co = k.shape[2], k.shape[3]
    out = np.zeros((1, 1, phases * ci, phases * co), k.dtype)
    for p in range(phases):
        out[0, 0, p * ci : (p + 1) * ci, p * co : (p + 1) * co] = k[0, 0]
    return out


def pack_3x3_kernel(k: np.ndarray, ph: int = 2, pw: int = 2) -> np.ndarray:
    """(3, 3, ci, co) stride-1 pad-1 -> (3, 3, ph*pw*ci, ph*pw*co) over the
    (ph x pw)-s2d layout (ph/pw in {1, 2}).

    Output packed pixel (I, J) phase (a, b) is canonical (ph*I+a, pw*J+b); its
    tap (r, s) reads canonical (ph*I+a+r-1, pw*J+b+s-1) = packed block
    (I+u, J+v) phase (dy, dx) with (u, dy) = divmod(a+r-1, ph),
    (v, dx) = divmod(b+s-1, pw).
    """
    k = np.asarray(k)
    assert k.shape[:2] == (3, 3), k.shape
    ci, co = k.shape[2], k.shape[3]
    P = ph * pw
    out = np.zeros((3, 3, P * ci, P * co), k.dtype)
    for a in range(ph):
        for b in range(pw):
            for r in range(3):
                u, dy = divmod(a + r - 1, ph)
                for s in range(3):
                    v, dx = divmod(b + s - 1, pw)
                    ci0 = (dy * pw + dx) * ci
                    co0 = (a * pw + b) * co
                    out[u + 1, v + 1, ci0 : ci0 + ci, co0 : co0 + co] = k[r, s]
    return out


def pack_cv12_kernel(k1: np.ndarray, k2: np.ndarray) -> np.ndarray:
    """Merge csp cv1 (1,1,ci,h) and cv2 (1,1,ci,h) into one packed dense 1x1
    (4ci -> 8h): out channels [cv1 phase-major (4h) | cv2 phase-major (4h)]."""
    p1, p2 = pack_1x1_kernel(k1), pack_1x1_kernel(k2)
    return np.concatenate([p1, p2], axis=3)


def pack_cv3_kernel(k3: np.ndarray, hidden: int) -> np.ndarray:
    """(1, 1, 2h, co) cv3 over canonical concat[y1, y2] -> (1, 1, 8h, 4co) over
    the packed layout [y1 phase-major (4h) | y2 phase-major (4h)] — the concat
    permutation is folded in here."""
    k3 = np.asarray(k3)
    assert k3.shape[:2] == (1, 1) and k3.shape[2] == 2 * hidden, k3.shape
    co = k3.shape[3]
    out = np.zeros((1, 1, 8 * hidden, 4 * co), k3.dtype)
    for p in range(4):
        rows_y1 = slice(p * hidden, (p + 1) * hidden)
        rows_y2 = slice(4 * hidden + p * hidden, 4 * hidden + (p + 1) * hidden)
        cols = slice(p * co, (p + 1) * co)
        out[0, 0, rows_y1, cols] = k3[0, 0, :hidden]
        out[0, 0, rows_y2, cols] = k3[0, 0, hidden:]
    return out


def _tile_bn(leaf: np.ndarray, phases: int = 4) -> np.ndarray:
    return np.tile(np.asarray(leaf), phases)


class PackedStage1(nn.Module):
    """Serving-form csp1 + down2 in the 2x2-s2d packed domain.

    Consumes the canonical down1 output (B, H, W, c2); emits the canonical
    down2 output (B, H/2, W/2, c3). Use with variables transformed by
    `pack_stage1_variables` (raw or BN-fused). Parity target: CSPBlock csp1 +
    ConvBlock down2 (reference blocks.py:93-123 + backbone.py stage 2 entry).
    """

    c2: int
    c3: int
    num_blocks: int = 1
    # input already in the 2x2-s2d packed layout (B, H/2, W/2, 4*c2) — the
    # packed_stem + pack_down1_p2p_kernel path; skips the on-device s2d2
    packed_input: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        h = self.c2 // 2  # csp hidden (expansion 0.5)
        if not self.packed_input:
            x = s2d2_device(x)  # (B, H/2, W/2, 4*c2)
        y = ConvBlock(8 * h, 1, 1, dtype=self.dtype, name="cv12")(x, train)
        y1, y2 = y[..., : 4 * h], y[..., 4 * h :]
        for i in range(self.num_blocks):
            t = ConvBlock(4 * h, 1, 1, dtype=self.dtype, name=f"m{i}_cv1")(y1, train)
            t = ConvBlock(4 * h, 3, 1, dtype=self.dtype, name=f"m{i}_cv2")(t, train)
            y1 = y1 + t  # canonical Bottleneck shortcut (expansion 1.0)
        y = jnp.concatenate([y1, y2], axis=-1)  # [y1 4h | y2 4h]; perm in cv3
        y = ConvBlock(4 * self.c2, 1, 1, dtype=self.dtype, name="cv3")(y, train)
        # down2: canonical 3x3/2 == packed 2x2/1 with ((1,0),(1,0)) padding
        return ConvBlock(self.c3, 2, stride=1, padding=((1, 0), (1, 0)),
                         dtype=self.dtype, name="down2")(y, train)


def pack_stage1_variables(variables: Dict) -> Dict:
    """Canonical detector variables -> the PackedStage1 layout.

    Restructures backbone.{csp1, down2} into backbone.packed_stage1.{cv12,
    m{i}_cv1, m{i}_cv2, cv3, down2} with remapped kernels and 4x phase-tiled BN
    leaves. Works on raw or fuse_conv_bn'd variables; all other leaves pass
    through. Composes with pack_stem_variables (disjoint subtrees).
    """
    import copy

    from .packed_stem import pack_down1_kernel

    out = copy.deepcopy(jax.tree_util.tree_map(np.asarray, variables))

    def bn_map(tree_bn, fn):
        return {k: fn(v) for k, v in tree_bn.items()}

    for plane in ("params", "batch_stats"):
        tree = out.get(plane)
        if not tree or "backbone" not in tree:
            continue
        bb = tree["backbone"]
        csp = bb.pop("csp1", None)
        dwn = bb.pop("down2", None)
        if csp is None and dwn is None:
            continue
        ps: Dict[str, Any] = {}
        if plane == "params":
            hidden = csp["cv1"]["conv"]["kernel"].shape[3]
            ps["cv12"] = {
                "conv": {"kernel": pack_cv12_kernel(
                    csp["cv1"]["conv"]["kernel"], csp["cv2"]["conv"]["kernel"])},
                "bn": {k: np.concatenate([_tile_bn(csp["cv1"]["bn"][k]),
                                          _tile_bn(csp["cv2"]["bn"][k])])
                       for k in csp["cv1"]["bn"]},
            }
            i = 0
            while f"m{i}" in csp:
                m = csp[f"m{i}"]
                ps[f"m{i}_cv1"] = {
                    "conv": {"kernel": pack_1x1_kernel(m["cv1"]["conv"]["kernel"])},
                    "bn": bn_map(m["cv1"]["bn"], _tile_bn),
                }
                ps[f"m{i}_cv2"] = {
                    "conv": {"kernel": pack_3x3_kernel(m["cv2"]["conv"]["kernel"])},
                    "bn": bn_map(m["cv2"]["bn"], _tile_bn),
                }
                i += 1
            ps["cv3"] = {
                "conv": {"kernel": pack_cv3_kernel(
                    csp["cv3"]["conv"]["kernel"], hidden)},
                "bn": bn_map(csp["cv3"]["bn"], _tile_bn),
            }
            ps["down2"] = {
                "conv": {"kernel": pack_down1_kernel(dwn["conv"]["kernel"])},
                "bn": dwn["bn"],
            }
        else:  # batch_stats: {name: {bn: {mean, var}}}
            ps["cv12"] = {"bn": {k: np.concatenate(
                [_tile_bn(csp["cv1"]["bn"][k]), _tile_bn(csp["cv2"]["bn"][k])])
                for k in csp["cv1"]["bn"]}}
            i = 0
            while f"m{i}" in csp:
                m = csp[f"m{i}"]
                ps[f"m{i}_cv1"] = {"bn": bn_map(m["cv1"]["bn"], _tile_bn)}
                ps[f"m{i}_cv2"] = {"bn": bn_map(m["cv2"]["bn"], _tile_bn)}
                i += 1
            ps["cv3"] = {"bn": bn_map(csp["cv3"]["bn"], _tile_bn)}
            ps["down2"] = {"bn": dwn["bn"]}
        bb["packed_stage1"] = ps
    return out
