"""Merged CSP split convs: one cv1+cv2 conv per CSP block (exact weight remap).

Every CSPBlock computes two 1x1 "split" convs — cv1 (into the bottleneck chain)
and cv2 (the bypass) — that read the SAME input tensor. At the wide early maps
those convs are HBM-bound (profiles/roofline.json: e.g. csp2's two 1x1
128->64 convs @160px each re-read a 105 MB input), so issuing them as two XLA
ops pays the input read twice. Computing them as ONE conv with the kernels
concatenated along the output-channel axis is mathematically identical — conv
output channels are independent, and BatchNorm statistics are per-channel, so
concatenating (scale, bias, mean, var) reproduces each branch bit-for-bit —
while reading the input once.

`merge_csp_cv12_variables` converts a canonical variables tree (cv1/cv2 layout)
into the cv12 layout consumed by `CSPBlock(merged_cv12=True)`; see
SkyEyeDetectorModule(merged_csp=True). Works before or after
`fuse_conv_bn` / `pack_stem_variables` / `pack_stage1_variables` (the walk is
signature-driven: it only rewrites subtrees that still hold a canonical CSP).

Replaces the serving half of the reference's CSP hot loop
(/root/reference/skyeye/core/models/blocks.py:93-123) with a TPU-bandwidth-
aware schedule; equivalence asserted by tests/test_merged_csp.py.
"""
from __future__ import annotations

from typing import Dict

import jax
import numpy as np


def _is_csp_params(node) -> bool:
    """A CSPBlock params/stats subtree: split convs + final conv + bottlenecks.

    (Bottleneck and SPP also own cv1/cv2, but never cv3 AND m0 together.)
    """
    return (
        isinstance(node, dict)
        and all(k in node for k in ("cv1", "cv2", "cv3", "m0"))
    )


def _merge_pair(cv1: Dict, cv2: Dict) -> Dict:
    """Concat two ConvBlock subtrees along the output-channel axis.

    Handles both the params shape ({conv: {kernel}, bn: {scale, bias}}) and the
    batch_stats shape ({bn: {mean, var}}).
    """
    out: Dict = {}
    if "conv" in cv1:
        k1, k2 = np.asarray(cv1["conv"]["kernel"]), np.asarray(cv2["conv"]["kernel"])
        out["conv"] = {"kernel": np.concatenate([k1, k2], axis=-1)}
    if "bn" in cv1:
        out["bn"] = {
            key: np.concatenate(
                [np.asarray(cv1["bn"][key]), np.asarray(cv2["bn"][key])], axis=0
            )
            for key in cv1["bn"]
        }
    return out


def merge_csp_cv12_variables(variables: Dict) -> Dict:
    """Rewrite every canonical CSP subtree from {cv1, cv2, ...} to {cv12, ...}."""

    def walk(node):
        if not isinstance(node, dict):
            return node
        if _is_csp_params(node):
            merged = {"cv12": _merge_pair(node["cv1"], node["cv2"])}
            merged.update(
                {k: walk(v) for k, v in node.items() if k not in ("cv1", "cv2")}
            )
            return merged
        return {k: walk(v) for k, v in node.items()}

    out = {col: walk(tree) for col, tree in variables.items()}
    return jax.tree_util.tree_map(np.asarray, out)
