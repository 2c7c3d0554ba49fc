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


def _is_canonical_csp(node) -> bool:
    """A CSPBlock subtree (raw cv1/cv2 or merged cv12), not SPP/Bottleneck."""
    return (isinstance(node, dict) and "m0" in node and "cv3" in node
            and ("cv1" in node or "cv12" in node))


def _emit_w2_1x1(k: np.ndarray) -> np.ndarray:
    """(1, 1, ci, co) -> (1, 2, ci, 2co): a stride-(1,2) conv over the
    CANONICAL input that emits the W-paired layout [out(w0) | out(w1)]."""
    k = np.asarray(k)
    ci, co = k.shape[2], k.shape[3]
    out = np.zeros((1, 2, ci, 2 * co), k.dtype)
    out[0, 0, :, :co] = k[0, 0]
    out[0, 1, :, co:] = k[0, 0]
    return out


def _emit_w2_cv12(k: np.ndarray, hidden: int) -> np.ndarray:
    """Merged cv12 (1, 1, ci, 2h) -> (1, 2, ci, 4h) emitting
    [y1(w0) | y1(w1) | y2(w0) | y2(w1)] so the chain slice y[..., :2h] is the
    W-paired y1 and y[..., 2h:] the W-paired bypass."""
    k = np.asarray(k)
    ci = k.shape[2]
    h = hidden
    out = np.zeros((1, 2, ci, 4 * h), k.dtype)
    out[0, 0, :, 0:h] = k[0, 0, :, :h]          # y1 w0
    out[0, 1, :, h : 2 * h] = k[0, 0, :, :h]    # y1 w1
    out[0, 0, :, 2 * h : 3 * h] = k[0, 0, :, h:]  # y2 w0
    out[0, 1, :, 3 * h :] = k[0, 0, :, h:]      # y2 w1
    return out


def _emit_w2_cv12_bn(leaf: np.ndarray, hidden: int) -> np.ndarray:
    b = np.asarray(leaf)
    return np.concatenate([b[:hidden], b[:hidden], b[hidden:], b[hidden:]])


def _consume_w2_cv3(k: np.ndarray, hidden: int) -> np.ndarray:
    """cv3 (1, 1, 2h, c) -> (1, 1, 4h, 2c) consuming the W-paired concat
    [y1(w0)|y1(w1)|y2(w0)|y2(w1)] and emitting [out(w0) | out(w1)] — the
    channel pair reshapes back to two canonical pixels without padding."""
    k = np.asarray(k)
    h, c = hidden, k.shape[3]
    out = np.zeros((1, 1, 4 * h, 2 * c), k.dtype)
    out[0, 0, 0:h, :c] = k[0, 0, :h]
    out[0, 0, h : 2 * h, c:] = k[0, 0, :h]
    out[0, 0, 2 * h : 3 * h, :c] = k[0, 0, h:]
    out[0, 0, 3 * h :, c:] = k[0, 0, h:]
    return out


def pack_csp_m_variables(variables: Dict, max_hidden: int = 127) -> Dict:
    """Rewrite narrow CSP blocks into the W-paired residency of
    CSPBlock(packed_m=True).

    Round-4 per-op attribution (profiles/r4s1_1280): at hidden < 128 the
    bottleneck 3x3 convs use a fraction of the 128 MXU lanes and run at ~26%
    of their floor (csp2/fpn3 @1280: 6 x 640 us vs 170 us floors). The whole
    block moves to (B, H, W/2, 2*ch): the split conv(s) emit the paired
    layout (1x2/stride-(1,2) remap), the chain packs phase-block-diagonally
    (pack_1x1_kernel 2 phases / pack_3x3_kernel ph=1 pw=2), and cv3 consumes
    the pair, emitting [out(w0)|out(w1)] channels that reshape to canonical
    for free. Exact remap — tests/test_packed_csp.py::test_packed_m_*.

    Walks the whole tree (params + batch_stats, raw or BN-fused) and rewrites
    every canonical CSP whose hidden width <= max_hidden; wider chains and the
    already-packed stage-1 subtree are left alone. The CSPBlock side applies
    the same hidden < 128 predicate, so module and variables stay in sync.
    """
    import re

    def pack_m(m):
        out = {}
        for blk, sub in m.items():
            new = {}
            if "conv" in sub:
                k = np.asarray(sub["conv"]["kernel"])
                if k.shape[:2] == (1, 1):
                    new["conv"] = {"kernel": pack_1x1_kernel(k, phases=2)}
                else:
                    new["conv"] = {"kernel": pack_3x3_kernel(k, ph=1, pw=2)}
            if "bn" in sub:
                new["bn"] = {kk: _tile_bn(v, 2) for kk, v in sub["bn"].items()}
            out[blk] = new
        return out

    def hidden_of(m0) -> int:
        cv2 = m0["cv2"]
        if "conv" in cv2:
            return int(np.asarray(cv2["conv"]["kernel"]).shape[3])
        return int(np.asarray(next(iter(cv2["bn"].values()))).shape[0])

    def pack_csp(node, hidden):
        out = {}
        for k, v in node.items():
            if re.fullmatch(r"m\d+", k):
                out[k] = pack_m(v)
            elif k in ("cv1", "cv2"):
                new = {}
                if "conv" in v:
                    new["conv"] = {"kernel": _emit_w2_1x1(v["conv"]["kernel"])}
                if "bn" in v:
                    new["bn"] = {kk: _tile_bn(b, 2) for kk, b in v["bn"].items()}
                out[k] = new
            elif k == "cv12":
                new = {}
                if "conv" in v:
                    new["conv"] = {"kernel": _emit_w2_cv12(
                        v["conv"]["kernel"], hidden)}
                if "bn" in v:
                    new["bn"] = {kk: _emit_w2_cv12_bn(b, hidden)
                                 for kk, b in v["bn"].items()}
                out[k] = new
            elif k == "cv3":
                new = {}
                if "conv" in v:
                    new["conv"] = {"kernel": _consume_w2_cv3(
                        v["conv"]["kernel"], hidden)}
                if "bn" in v:
                    new["bn"] = {kk: _tile_bn(b, 2) for kk, b in v["bn"].items()}
                out[k] = new
            else:
                out[k] = walk(v)
        return out

    def walk(node):
        if not isinstance(node, dict):
            return node
        if _is_canonical_csp(node):
            h = hidden_of(node["m0"])
            if h <= max_hidden:
                return pack_csp(node, h)
        return {k: walk(v) for k, v in node.items()}

    out = {col: walk(tree) for col, tree in variables.items()}
    return jax.tree_util.tree_map(np.asarray, out)


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
