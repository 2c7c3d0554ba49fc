"""Space-to-depth packed stem: the TPU-native input layout for the first stage.

Problem (measured on v5e, 1280px batch 16): the stem's 6x6/2 conv on a raw
(B, H, W, 3) NHWC image costs 17 ms of a 28 ms backbone — 3 input channels occupy 3
of 128 lanes, so the input read and the MXU are ~97% idle. (The reference hits the
same physics on CUDA and works around it with the Focus space-to-depth block,
/root/reference/skyeye/core/models/blocks.py:152-182.)

TPU-native fix: feed the network a 4x4 space-to-depth packed image
(B, H/4, W/4, 48) — packed on the HOST, the exact analogue of torch's host-side
HWC->CHW transpose — and rewrite the first two convs in the s2d domain with exact
weight remapping:

  * fused stem 6x6/2 (3 -> c1)    ==  3x3/1 conv (48 -> 4*c1), output being the
    2x2-s2d packing of the canonical stem output;
  * down1 3x3/2 (c1 -> c2)        ==  2x2/1 conv (4*c1 -> c2) with ((1,0),(1,0))
    padding, consuming that packed form and emitting the canonical
    (B, H/4, W/4, c2) tensor — everything downstream is unchanged.

Both convs run at full 128-lane utilization. BatchNorm/SiLU commute with the
packing (per-channel affine / elementwise), so the transform is exact: BN params
for the stem are tiled 4x. Derivation: output pixel (2I+a, 2J+b) of the 6x6/2 conv
reads original rows 4I+2a+r-2, r in 0..5; writing that row as 4(I+u)+dy gives the
tap mapping (u, dy) = divmod(2a+r-2, 4), a 3-tap kernel in the s2d-4 domain.
"""
from __future__ import annotations

from typing import Dict

import numpy as np

import jax
import jax.numpy as jnp


def s2d4_host(x: np.ndarray) -> np.ndarray:
    """(..., H, W, C) uint8/float -> (..., H/4, W/4, 16*C), channel (dy*4+dx)*C + c.
    Host-side numpy packing for loader/bench pipelines."""
    *lead, H, W, C = x.shape
    y = x.reshape(*lead, H // 4, 4, W // 4, 4, C)
    y = np.moveaxis(y, -4, -3)  # (..., H/4, W/4, 4, 4, C)
    return np.ascontiguousarray(y.reshape(*lead, H // 4, W // 4, 16 * C))


def s2d4_device(x: jnp.ndarray) -> jnp.ndarray:
    """Device-side fallback of s2d4_host (an uint8 transpose costs ~6 ms/batch16
    at 1280px on v5e — prefer host packing when a loader is in the path)."""
    *lead, H, W, C = x.shape
    y = x.reshape(*lead, H // 4, 4, W // 4, 4, C)
    y = jnp.moveaxis(y, -4, -3)
    return y.reshape(*lead, H // 4, W // 4, 16 * C)


def pack_stem_kernel(kf: np.ndarray) -> np.ndarray:
    """(6, 6, C, c1) stride-2 pad-2 kernel -> (3, 3, 16*C, 4*c1) stride-1 pad-1
    kernel over the s2d-4 input; output channel (a*2+b)*c1 + o is the (a, b)
    phase of the canonical output (its 2x2-s2d packing)."""
    kf = np.asarray(kf)
    assert kf.shape[:2] == (6, 6), kf.shape
    C, c1 = kf.shape[2], kf.shape[3]
    out = np.zeros((3, 3, 16 * C, 4 * c1), kf.dtype)
    for a in range(2):
        for b in range(2):
            for r in range(6):
                u, dy = divmod(2 * a + r - 2, 4)
                for s in range(6):
                    v, dx = divmod(2 * b + s - 2, 4)
                    ci = (dy * 4 + dx) * C
                    co = (a * 2 + b) * c1
                    out[u + 1, v + 1, ci : ci + C, co : co + c1] = kf[r, s]
    return out


def pack_down1_kernel(kd: np.ndarray) -> np.ndarray:
    """(3, 3, c1, c2) stride-2 pad-1 kernel -> (2, 2, 4*c1, c2) stride-1
    pad-((1,0),(1,0)) kernel consuming the 2x2-s2d packed stem output."""
    kd = np.asarray(kd)
    assert kd.shape[:2] == (3, 3), kd.shape
    c1, c2 = kd.shape[2], kd.shape[3]
    out = np.zeros((2, 2, 4 * c1, c2), kd.dtype)
    for r in range(3):
        u, dy = divmod(r - 1, 2)
        for s in range(3):
            v, dx = divmod(s - 1, 2)
            ci = (dy * 2 + dx) * c1
            out[u + 1, v + 1, ci : ci + c1, :] = kd[r, s]
    return out


def pack_down1_p2p_kernel(kd: np.ndarray) -> np.ndarray:
    """(3, 3, c1, c2) stride-2 pad-1 kernel -> (3, 3, 4*c1, 4*c2) stride-2
    pad-((1,0),(1,0)) kernel: packed-in AND packed-out down1.

    Consumes the 2x2-s2d packed stem output and emits the 2x2-s2d packing of
    the canonical down1 output — the exact layout ops.packed_csp.PackedStage1
    consumes, so the inter-stage s2d2 transpose (a ~2 ms/batch16 relayout pair
    at 1280px, profiles/r3_1280 copy.67/copy.68) disappears entirely.

    Derivation: packed output block (I, J) phase (a, b) is canonical out
    (2I+a, 2J+b), reading canonical input (4I+2a+r-1, 4J+2b+s-1); writing
    2a+r-1 = 2u+dy gives input block (2I+u, 2J+v) phase (dy, dx) — a 3-tap
    stride-2 conv over input blocks with (u, dy) = divmod(2a+r-1, 2)."""
    kd = np.asarray(kd)
    assert kd.shape[:2] == (3, 3), kd.shape
    c1, c2 = kd.shape[2], kd.shape[3]
    out = np.zeros((3, 3, 4 * c1, 4 * c2), kd.dtype)
    for a in range(2):
        for b in range(2):
            for r in range(3):
                u, dy = divmod(2 * a + r - 1, 2)
                for s in range(3):
                    v, dx = divmod(2 * b + s - 1, 2)
                    ci = (dy * 2 + dx) * c1
                    co = (a * 2 + b) * c2
                    out[u + 1, v + 1, ci : ci + c1, co : co + c2] = kd[r, s]
    return out


def fold_input_scale(variables: Dict, scale: float = 1.0 / 255.0) -> Dict:
    """Fold the input normalization (x * scale) into the stem conv kernel.

    conv(x * s, k) == conv(x, k * s) exactly (linearity), so scaling the stem
    kernel lets the serving pipeline feed uint8 frames converted to bf16 with NO
    separate normalize pass. The conv OUTPUT is unchanged, so BN statistics /
    fused biases downstream remain valid. Why it matters (measured,
    profiles/r3_1280_latedecode copy.179): the standalone `frames/255` pass
    materialized a bf16[16,320,320,48] plane whose layout disagreed with the
    stem conv's choice, costing a 1.13 ms relayout copy per batch @1280 b16 —
    folding removes the plane entirely. Composes with pack_stem_variables /
    pack_stage1_variables (pure linear remaps of the same kernel).
    """
    import copy

    out = copy.deepcopy(jax.tree_util.tree_map(np.asarray, variables))
    stem = out["params"]["backbone"]["stem"]["conv"]
    stem["kernel"] = np.asarray(stem["kernel"]) * scale
    return out


def pack_stem_variables(variables: Dict, down1_p2p: bool = False) -> Dict:
    """Transform canonical detector variables into the packed-stem form expected by
    modules built with packed_stem=True: stem kernel 6x6 -> 3x3 s2d (BN leaves tiled
    4x), down1 kernel 3x3 -> 2x2 s2d. Works on fused (fuse_conv_bn) or raw
    variables; all other leaves pass through untouched.

    With `down1_p2p=True` (pair with packed_stage1=True modules), down1 is
    remapped packed-in/packed-out (pack_down1_p2p_kernel, BN tiled 4x) so its
    output feeds PackedStage1 with no inter-stage transpose."""
    import copy

    out = copy.deepcopy(jax.tree_util.tree_map(np.asarray, variables))
    bb_p = out["params"]["backbone"]
    bb_p["stem"]["conv"]["kernel"] = pack_stem_kernel(bb_p["stem"]["conv"]["kernel"])
    d1_pack = pack_down1_p2p_kernel if down1_p2p else pack_down1_kernel
    bb_p["down1"]["conv"]["kernel"] = d1_pack(bb_p["down1"]["conv"]["kernel"])
    for tree in (out["params"], out.get("batch_stats", {})):
        stem_bn = tree.get("backbone", {}).get("stem", {}).get("bn")
        if stem_bn:
            for k in stem_bn:
                stem_bn[k] = np.tile(stem_bn[k], 4)
        if down1_p2p:
            d1_bn = tree.get("backbone", {}).get("down1", {}).get("bn")
            if d1_bn:
                for k in d1_bn:
                    d1_bn[k] = np.tile(d1_bn[k], 4)
    return out
