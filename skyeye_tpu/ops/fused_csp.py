"""Serving-path fused CSP: flax module + variables transform.

Pairs with ops/pallas/csp_kernel.py the same way ops/packed_stem.py pairs with
the packed stem: `fused_csp=True` on the detector swaps the stage-1 CSP for
`FusedCSPBlock` (flat parameters, Pallas compute), and `fuse_csp_variables`
rewrites BN-FOLDED canonical variables (utils/checkpoint.py fuse_conv_bn) into
that layout. Numerically equivalent to the canonical CSPBlock
(tests/test_pallas_kernels.py).
"""
from __future__ import annotations

import os
from typing import Any, Dict

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


def _pallas_available() -> bool:
    if os.environ.get("SKYEYE_NO_PALLAS"):
        return False
    try:
        return jax.devices()[0].platform in ("tpu", "axon")
    except Exception:
        return False


class FusedCSPBlock(nn.Module):
    """CSP block computed by the fused Pallas kernel (serving only).

    Parameter layout is FLAT (w_cv1, b_cv1, ...) — produced from canonical
    folded variables by `fuse_csp_variables`, never trained directly.
    """

    out_channels: int
    num_blocks: int = 1
    expansion: float = 0.5
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        assert not train, "FusedCSPBlock is a serving-only path"
        C = x.shape[-1]
        h = int(self.out_channels * self.expansion)
        nb = self.num_blocks
        z = nn.initializers.zeros
        weights = {
            "w_cv1": self.param("w_cv1", z, (C, h), jnp.float32),
            "b_cv1": self.param("b_cv1", z, (h,), jnp.float32),
            "w_m1": self.param("w_m1", z, (nb, h, h), jnp.float32),
            "b_m1": self.param("b_m1", z, (nb, h), jnp.float32),
            "w_m2": self.param("w_m2", z, (nb, 3, 3, h, h), jnp.float32),
            "b_m2": self.param("b_m2", z, (nb, h), jnp.float32),
            "w_cv2": self.param("w_cv2", z, (C, h), jnp.float32),
            "b_cv2": self.param("b_cv2", z, (h,), jnp.float32),
            "w_cv3": self.param("w_cv3", z, (2 * h, self.out_channels), jnp.float32),
            "b_cv3": self.param("b_cv3", z, (self.out_channels,), jnp.float32),
        }
        from .pallas.csp_kernel import csp_fused_v2

        # v2 (halo-DMA input window, ~2 MB VMEM footprint) composes inside the
        # full serving pipeline; v1's resident-image budget blocked compilation
        # there (round-2 VERDICT #1)
        return csp_fused_v2(
            x.astype(jnp.bfloat16), weights, num_blocks=nb, tile_rows=32,
            interpret=not _pallas_available(),
        ).astype(self.dtype)


def _require_identity_bn(bn: Dict, stats: Dict, where: str):
    if not np.allclose(np.asarray(bn["scale"]), 1.0) or not np.allclose(
        np.asarray(stats["mean"]), 0.0
    ):
        raise ValueError(
            f"{where}: variables are not BN-folded — run "
            "utils.checkpoint.fuse_conv_bn first (FusedCSPBlock consumes "
            "folded conv+bias weights)"
        )


def fuse_csp_variables(variables, path=("backbone", "csp1")) -> Dict:
    """Rewrite one canonical (BN-folded) CSP subtree into FusedCSPBlock layout.

    Returns new variables: params[path] replaced by the flat weight set;
    batch_stats[path] dropped (the fused module has none).
    """
    import copy

    params = copy.deepcopy(jax.tree_util.tree_map(np.asarray, variables["params"]))
    stats = copy.deepcopy(
        jax.tree_util.tree_map(np.asarray, variables.get("batch_stats", {}))
    )
    psub = params
    ssub = stats
    for k in path[:-1]:
        psub, ssub = psub[k], ssub.get(k, {})
    csp = psub[path[-1]]
    csp_stats = ssub.get(path[-1], {})

    def conv_wb(name, squeeze_1x1: bool):
        node, st = csp[name], csp_stats.get(name, {})
        _require_identity_bn(node["bn"], st.get("bn", {"mean": 0.0}), f"{path}/{name}")
        k = node["conv"]["kernel"]  # (kh, kw, in, out)
        if squeeze_1x1:
            assert k.shape[:2] == (1, 1), k.shape
            k = k[0, 0]
        return k, node["bn"]["bias"]

    nb = len([k for k in csp if k.startswith("m")])
    w_cv1, b_cv1 = conv_wb("cv1", True)
    w_cv2, b_cv2 = conv_wb("cv2", True)
    w_cv3, b_cv3 = conv_wb("cv3", True)
    m1k, m1b, m2k, m2b = [], [], [], []
    for i in range(nb):
        node, st = csp[f"m{i}"], csp_stats.get(f"m{i}", {})
        for sub in ("cv1", "cv2"):
            _require_identity_bn(
                node[sub]["bn"], st.get(sub, {}).get("bn", {"mean": 0.0}),
                f"{path}/m{i}/{sub}",
            )
        m1k.append(node["cv1"]["conv"]["kernel"][0, 0])
        m1b.append(node["cv1"]["bn"]["bias"])
        m2k.append(node["cv2"]["conv"]["kernel"])  # (3, 3, h, h)
        m2b.append(node["cv2"]["bn"]["bias"])

    psub[path[-1]] = {
        "w_cv1": w_cv1, "b_cv1": b_cv1,
        "w_m1": np.stack(m1k), "b_m1": np.stack(m1b),
        "w_m2": np.stack(m2k), "b_m2": np.stack(m2b),
        "w_cv2": w_cv2, "b_cv2": b_cv2,
        "w_cv3": w_cv3, "b_cv3": b_cv3,
    }
    if path[-1] in ssub:
        del ssub[path[-1]]
    return {"params": params, "batch_stats": stats}
