"""Late decode: pre-NMS candidate cut on RAW head logits, decode only survivors.

Why (measured, profiles/r3_1280 + /tmp/prof_packed on v5e @1280 b16): the
canonical serving order is decode-everything-then-cut —
`decode_predictions` materializes per-level (B, H, W, na, no) f32 tensors and
their (B, N, no) relayout for the top-k (head.py:65-106). With no = nc+5 = 15,
the minor dim occupies 15 of 128 TPU lanes, so those copies cost ~8.5x their
logical bytes in HBM traffic: copy.76/copy.78/copy.81 alone were 2.4 ms of a
30.4 ms launch. The reference pays the same ordering on CUDA
(/root/reference/skyeye/core/models/detector.py:119-141 decodes every anchor,
then utils/metrics.py:361-457 filters).

TPU-native fix: rank candidates directly on the raw (B, H, W, na, no) logits —
score = sigmoid(obj) * sigmoid(max cls logit), one fused read of the conv
output, emitting only a (B, N) score plane — approx/exact top-k per level,
gather the k surviving rows (tiny), and run the sigmoid/grid/anchor decode
math on (B, k) vectors. The candidate CUT semantics match
`_nms_single_impl`'s single-label path (obj gate AND conf gate, reference
metrics.py:385,407); the only difference is per-level quotas instead of one
global top-max_nms — irrelevant whenever per-level survivors fit their quota
(always true at serving conf, measured 0.00 pt mAP50 in
profiles/approx_topk_r03.json protocol).

Multi-label serving and mAP evaluation keep the canonical decode path.
"""
from __future__ import annotations

import functools
import math
import os
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from .boxes import xywh2xyxy


def default_recall_target() -> float:
    """Serving-wide ApproxTopK recall target (env `SKYEYE_TOPK_RECALL`).

    recall_target steers XLA's ApproxTopK partitioning: at the P3 geometry
    (k=768 of n=76800) the default 0.95 makes the lowering fall back to a FULL
    exact sort — 1.03 ms/batch @1280 b16, the single biggest post-head op
    (profiles/r3_1280_latedecode: approx_top_k.62 long_name is a sort, not the
    ApproxTopK custom call). A looser target keeps the O(n) partial-reduce
    path; the mAP impact of the cut is gated on chip (tools/approx_topk_eval).
    Every approx candidate cut (api, detect, bench, late_decode, nms) resolves
    through here so the serving default is one value.
    """
    return float(os.environ.get("SKYEYE_TOPK_RECALL", "0.95"))


def approx_or_exact_topk(approx: bool, recall_target: Optional[float] = None):
    """The shared top-k operator: `jax.lax.approx_max_k` at the serving recall
    target (see default_recall_target) or the exact `jax.lax.top_k`."""
    if not approx:
        return jax.lax.top_k
    if recall_target is None:
        recall_target = default_recall_target()
    return functools.partial(jax.lax.approx_max_k, recall_target=recall_target)


def level_quotas(counts: Sequence[int], max_nms: int) -> List[int]:
    """Static per-level candidate quotas, proportional to each level's anchor
    count, rounded to multiples of 128 (TPU lane width), min 128, capped at the
    level size. Sum ~= max_nms by construction."""
    total = float(sum(counts))
    ks = []
    for c in counts:
        k = int(round(max_nms * c / total / 128.0)) * 128
        # top_k requires k <= level size, which wins over lane rounding (tiny
        # test geometries have levels smaller than one 128 lane)
        ks.append(min(c, max(128, k)))
    return ks


def topk_candidates(
    outputs: Sequence[jnp.ndarray],
    anchors,
    input_shape: Tuple[int, int],
    conf_thres: float = 0.25,
    max_nms: int = 4096,
    approx_topk: bool = True,
    class_mask: Optional[jnp.ndarray] = None,
    recall_target: Optional[float] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Raw per-level head logits -> top candidate (boxes_xyxy, scores, cls).

    Args:
      outputs: list of (B, H, W, na, no) RAW logits (head output, pre-sigmoid).
      anchors: (nl, na, 2) grid-unit anchors.
      input_shape: (in_h, in_w) for stride derivation (head.py:77).
      conf_thres: reference candidate gate — obj > conf AND obj*cls > conf.
      max_nms: total candidate budget across levels.
      approx_topk: lax.approx_max_k (serving default) vs exact lax.top_k.
      class_mask: optional (nc,) bool — candidates restricted to these classes.

    Returns:
      boxes: (B, K, 4) xyxy in input pixels, scores: (B, K) with invalid = -1,
      cls: (B, K) float class indices. K = sum of per-level quotas.
    """
    anchors = jnp.asarray(anchors, jnp.float32)
    in_h, in_w = input_shape
    # conf gate on raw logits: sigmoid is monotonic, so obj > conf  <=>
    # obj_logit > logit(conf). math (not jnp): under an outer jit trace a jnp
    # op on a python float would stage a tracer and break the static gate.
    conf_logit = (math.log(conf_thres / (1.0 - conf_thres))
                  if conf_thres > 0 else -math.inf)
    quotas = level_quotas([o.shape[1] * o.shape[2] * o.shape[3] for o in outputs],
                          max_nms)
    topk = approx_or_exact_topk(approx_topk, recall_target)

    all_boxes, all_scores, all_cls = [], [], []
    for i, out in enumerate(outputs):
        B, H, W, na, no = out.shape
        stride = max(in_h / H, in_w / W)
        k = quotas[i]

        # Flat-read experiment (`SKYEYE_FLAT_DECODE=1`): read the flat
        # (B, H, W, na*no) conv output via strided channel slices instead of
        # materializing the (B, H, W, na, no) view, hoping to cancel a 0.34 ms
        # relayout copy (profile op copy.146 in profiles/r3s6_1280). A/B on
        # chip says the 5-D view WINS — the per-anchor strided minor-dim
        # slices cost more full-plane reads than the one relayout copy they
        # save — so the view path stays the default.
        if os.environ.get("SKYEYE_FLAT_DECODE"):
            flat = out.reshape(B, H, W, na * no)
            obj_l = jnp.stack(                              # (B, H, W, na)
                [flat[..., a * no + 4] for a in range(na)], axis=-1
            ).astype(jnp.float32)
            cls_max = jnp.stack(                            # (B, H, W, na)
                [jnp.max(flat[..., a * no + 5 : (a + 1) * no], axis=-1)
                 for a in range(na)], axis=-1
            ).astype(jnp.float32)
            cls_arg_fn = lambda: jnp.stack(                 # noqa: E731
                [jnp.argmax(flat[..., a * no + 5 : (a + 1) * no], axis=-1)
                 for a in range(na)], axis=-1)              # (B, H, W, na)
        else:
            obj_l = out[..., 4].astype(jnp.float32)         # (B, H, W, na)
            cls_l = out[..., 5:].astype(jnp.float32)        # (B, H, W, na, nc)
            cls_max = jnp.max(cls_l, axis=-1)               # (B, H, W, na)
            cls_arg_fn = lambda: jnp.argmax(cls_l, axis=-1)  # noqa: E731
        score = jax.nn.sigmoid(obj_l) * jax.nn.sigmoid(cls_max)
        valid = (obj_l > conf_logit) & (score > conf_thres)
        if class_mask is not None:
            # reference classes= filter (metrics.py:424-427): drop candidates
            # whose single-label argmax class is not allowed (no re-assignment)
            valid &= class_mask[cls_arg_fn()]
        score = jnp.where(valid, score, -1.0).reshape(B, H * W * na)

        top_scores, top_idx = topk(score, k)               # (B, k)
        # flat idx = (y * W + x) * na + a
        a = top_idx % na
        pix = top_idx // na
        x = (pix % W).astype(jnp.float32)
        y = (pix // W).astype(jnp.float32)

        bidx = jnp.arange(B)[:, None]
        if os.environ.get("SKYEYE_FLAT_DECODE"):
            # gather the full na*no row per candidate (tiny: k rows), then
            # select the anchor slab — keeps the gather on the flat tensor
            rows_all = flat[bidx, pix // W, pix % W]        # (B, k, na*no)
            rows = jnp.take_along_axis(
                rows_all.reshape(B, k, na, no), a[:, :, None, None], axis=2
            )[:, :, 0].astype(jnp.float32)                  # (B, k, no)
        else:
            rows = out[bidx, pix // W, pix % W, a].astype(jnp.float32)
        sr = jax.nn.sigmoid(rows)
        xy = (sr[..., 0:2] * 2.0 - 0.5 + jnp.stack([x, y], axis=-1)) * stride
        wh = (sr[..., 2:4] * 2.0) ** 2 * (anchors[i][a] * stride)
        boxes = xywh2xyxy(jnp.concatenate([xy, wh], axis=-1))

        cls_idx = jnp.argmax(rows[..., 5:], axis=-1).astype(jnp.float32)

        all_boxes.append(boxes)
        all_scores.append(jnp.where(top_scores > conf_thres, top_scores, -1.0))
        all_cls.append(cls_idx)

    return (jnp.concatenate(all_boxes, axis=1),
            jnp.concatenate(all_scores, axis=1),
            jnp.concatenate(all_cls, axis=1))


def late_decode_nms(
    outputs: Sequence[jnp.ndarray],
    anchors,
    input_shape: Tuple[int, int],
    conf_thres: float = 0.25,
    iou_thres: float = 0.45,
    agnostic: bool = False,
    max_det: int = 300,
    max_nms: int = 4096,
    approx_topk: bool = True,
    class_mask: Optional[jnp.ndarray] = None,
    recall_target: Optional[float] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Raw head logits -> ((B, max_det, 6) detections, (B,) valid counts).

    The serving-path replacement for decode_predictions + nms single-label:
    identical output semantics, none of the (*, no)-minor lane-padded
    intermediates."""
    from .nms import suppress_candidates_batched

    boxes, scores, cls = topk_candidates(
        outputs, anchors, input_shape, conf_thres=conf_thres, max_nms=max_nms,
        approx_topk=approx_topk, class_mask=class_mask,
        recall_target=recall_target)
    # one lockstep suppression pass for the whole batch (a vmap of the
    # per-image kernel serializes the batch on the TensorCore)
    return suppress_candidates_batched(boxes, scores, cls, iou_thres=iou_thres,
                                       max_det=max_det, agnostic=agnostic)
