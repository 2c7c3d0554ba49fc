"""Detection losses: YOLOv5-convention ComputeLoss, focal/BCE variants, aerial loss.

Capability parity (reference /root/reference/skyeye/core/loss/functions.py):
  smooth_bce          <- functions.py:12-23
  FocalLoss           <- functions.py:114-164 (gamma=1.5, alpha=0.25)
  ModulatedBCE        <- BCEWithLogitsLoss, functions.py:167-210 (QFL-style 1-exp mod)
  AerialDetectionLoss <- functions.py:213-312 (small-object extra box term)
  ComputeLoss         <- functions.py:315-505 (build_targets with anchor-ratio filter
                         max(r,1/r) < 4.0 and 5-offset neighbor-cell table, CIoU box,
                         detached-IoU obj targets, per-level balance [4.0, 1.0, 0.4])

TPU-native redesign (SURVEY.md §7 "hard parts"): the reference's build_targets is
dynamic — boolean gathers shrink tensors per level (functions.py:476-488), which is
untraceable under jit. Here assignment is a FIXED-SHAPE masked computation: every
(offset, anchor, target) triple has a static slot (5, na, M); invalid slots carry a
False mask and are excluded from masked means / scattered with mode='drop'. Loss value
is identical to the dynamic version for any target set that fits the padding.

Also fixed vs reference (SURVEY.md §8): ComputeLoss no longer assumes a YOLOv5
`model.model[-1]` layout (functions.py:331) and `na` is derived from the anchors
(functions.py:439 used an unset attribute).
"""
from __future__ import annotations

from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from ..ops.boxes import bbox_iou


def smooth_bce(eps: float = 0.1) -> Tuple[float, float]:
    """Label-smoothed BCE target pair (positive, negative)."""
    return 1.0 - 0.5 * eps, 0.5 * eps


def bce_with_logits(pred, target):
    """Elementwise binary cross-entropy with logits (numerically stable)."""
    return jnp.maximum(pred, 0) - pred * target + jnp.log1p(jnp.exp(-jnp.abs(pred)))


def focal_loss(pred, target, gamma: float = 1.5, alpha: float = 0.25):
    """Elementwise focal-modulated BCE (reference functions.py:133-156)."""
    bce = bce_with_logits(pred, target)
    p = jax.nn.sigmoid(pred)
    p_t = target * p + (1 - target) * (1 - p)
    alpha_factor = target * alpha + (1 - target) * (1 - alpha)
    return alpha_factor * (1.0 - p_t) ** gamma * bce


def modulated_bce(pred, target, alpha: float = 0.05):
    """BCE scaled by 1 - exp(-|y - p| / alpha) (reference functions.py:185-202)."""
    bce = bce_with_logits(pred, target)
    p = jax.nn.sigmoid(pred)
    mod = 1.0 - jnp.exp(-jnp.abs(target - p) / alpha)
    return bce * mod


def masked_mean(x, mask, eps: float = 1e-9):
    """Mean of x over True mask entries (broadcast mask over trailing dims)."""
    mask = mask.astype(x.dtype)
    while mask.ndim < x.ndim:
        mask = mask[..., None]
    denom = jnp.sum(mask) * (x.size / mask.size if mask.size else 1.0)
    return jnp.sum(x * mask) / jnp.maximum(denom, eps)


# The 5-entry neighbor offset table: center, left, up, right, down (scaled by g=0.5)
# (reference functions.py:452-458). Kept as numpy: creating a device array at import
# time would initialize the JAX backend before the caller can configure it.
import numpy as _np

_OFFSETS = _np.array(
    [[0.0, 0.0], [1.0, 0.0], [0.0, 1.0], [-1.0, 0.0], [0.0, -1.0]], _np.float32
)
_G = 0.5


def build_targets_level(
    targets: jnp.ndarray,
    valid: jnp.ndarray,
    anchors_level: jnp.ndarray,
    grid_hw: Tuple[int, int],
    anchor_t: float = 4.0,
):
    """Fixed-shape target assignment for one pyramid level.

    Args:
      targets: (M, 6) [img_idx, cls, x, y, w, h] with xywh normalized to [0, 1].
      valid: (M,) bool padding mask.
      anchors_level: (na, 2) grid-unit anchors for this level.
      grid_hw: (gh, gw) static grid dims.

    Returns dict with static-shaped assignment arrays, flat size K = 5 * na * M:
      b, a, gj, gi (int32), tbox (K, 4) [dx, dy, gw, gh], cls (K,), anchor_wh (K, 2),
      mask (K,) bool.
    """
    gh, gw = grid_hw
    M = targets.shape[0]
    na = anchors_level.shape[0]

    gain = jnp.array([1.0, 1.0, gw, gh, gw, gh], jnp.float32)
    t = targets * gain  # (M, 6) in grid units

    # anchor-ratio filter (functions.py:473-477)
    r = t[None, :, 4:6] / anchors_level[:, None, :]  # (na, M, 2)
    anchor_ok = jnp.max(jnp.maximum(r, 1.0 / r), axis=-1) < anchor_t  # (na, M)

    gxy = t[:, 2:4]  # (M, 2)
    gxi = jnp.array([gw, gh], jnp.float32) - gxy
    jk = (jnp.mod(gxy, 1.0) < _G) & (gxy > 1.0)  # (M, 2) -> left/up eligible
    lm = (jnp.mod(gxi, 1.0) < _G) & (gxi > 1.0)  # (M, 2) -> right/down eligible
    off_ok = jnp.stack(
        [jnp.ones((M,), bool), jk[:, 0], jk[:, 1], lm[:, 0], lm[:, 1]], axis=0
    )  # (5, M)

    mask = valid[None, None, :] & anchor_ok[None, :, :] & off_ok[:, None, :]  # (5,na,M)

    gij = jnp.floor(gxy[None, :, :] - _OFFSETS[:, None, :] * _G)  # (5, M, 2)
    gi = jnp.clip(gij[..., 0], 0, gw - 1).astype(jnp.int32)  # (5, M)
    gj = jnp.clip(gij[..., 1], 0, gh - 1).astype(jnp.int32)

    # the reference's in-place clamp_ mutates gij BEFORE tbox is built
    # (functions.py:500-501), so dxy uses the clamped cell coordinates
    gij_clamped = jnp.stack([gi, gj], axis=-1).astype(jnp.float32)
    dxy = gxy[None, :, :] - gij_clamped  # (5, M, 2)
    gwh = t[:, 4:6]  # (M, 2)

    # broadcast to (5, na, M, ...) and flatten
    K = 5 * na * M
    b = jnp.broadcast_to(targets[None, None, :, 0].astype(jnp.int32), (5, na, M))
    cls = jnp.broadcast_to(targets[None, None, :, 1].astype(jnp.int32), (5, na, M))
    a = jnp.broadcast_to(
        jnp.arange(na, dtype=jnp.int32)[None, :, None], (5, na, M)
    )
    gi_f = jnp.broadcast_to(gi[:, None, :], (5, na, M))
    gj_f = jnp.broadcast_to(gj[:, None, :], (5, na, M))
    tbox = jnp.broadcast_to(
        jnp.concatenate([dxy, jnp.broadcast_to(gwh[None], dxy.shape[:2] + (2,))], -1)[
            :, None, :, :
        ],
        (5, na, M, 4),
    )
    anchor_wh = jnp.broadcast_to(anchors_level[None, :, None, :], (5, na, M, 2))

    return {
        "b": b.reshape(K),
        "a": a.reshape(K),
        "gj": gj_f.reshape(K),
        "gi": gi_f.reshape(K),
        "tbox": tbox.reshape(K, 4),
        "cls": cls.reshape(K),
        "anchor_wh": anchor_wh.reshape(K, 2),
        "mask": mask.reshape(K),
    }


class ComputeLoss:
    """YOLOv5-convention training loss over NHWC-native head outputs.

    Head outputs: list of (B, H, W, na, nc+5) raw logits.
    Targets: (M, 6) [img, cls, x, y, w, h] normalized, plus (M,) validity mask.
    """

    def __init__(
        self,
        anchors,
        num_classes: int,
        hyp: Optional[Dict[str, float]] = None,
        dense: bool = False,
    ):
        from ..config import DEFAULT_HYP

        self.hyp = dict(DEFAULT_HYP)
        if hyp:
            self.hyp.update(hyp)
        self.dense = dense
        self.anchors = jnp.asarray(anchors, jnp.float32)  # (nl, na, 2) grid units
        self.nl = self.anchors.shape[0]
        self.na = self.anchors.shape[1]
        self.nc = num_classes
        # per-level obj balance (functions.py:359)
        self.balance = [4.0, 1.0, 0.4] if self.nl == 3 else [4.0, 1.0, 0.25, 0.06, 0.02]
        self.cp, self.cn = smooth_bce(self.hyp.get("label_smoothing", 0.0))
        self.gamma = self.hyp.get("fl_gamma", 0.0)

    def _cls_obj_bce(self, pred, target):
        if self.gamma > 0:
            return focal_loss(pred, target, gamma=self.gamma, alpha=0.25)
        return bce_with_logits(pred, target)

    def _level_dense(self, pi, asg, w, i, img_weight):
        """Dense-cotangent formulation of one level's loss (opt-in).

        The exact path gathers the K matched rows (``pi[b, gj, gi, a]``);
        the gather's VJP is a serialized scatter-add of (K, no) cotangents
        into the lane-padded no-minor prediction map — ~1.0 ms/step of
        scatter plus ~1.3 ms of layout churn at train640 b16
        (profiles/r4s5_train640: fusion.13/fusion.9 + pad.109 +
        reshape.1286/1287). Here the TARGETS scatter instead — one fused
        ``.add`` of [w, w*tbox, w*cls] per level, all constants, wrapped in
        stop_gradient — and every loss term is a dense masked elementwise
        reduction over the (B, H, W, na) map, so the backward pass through
        the loss is pure fused elementwise.

        Semantics: identical to the exact path whenever each (image, anchor,
        cell) triple holds at most one assignment (tests/test_dense_loss.py
        asserts value+gradient equality there). On a collision the exact
        path sums per-assignment losses; this path computes one loss at the
        weighted-mean box (rounding the mean class id) — a documented
        deviation, which is why the exact path stays the default for
        reference parity.
        """
        B, H, W, na, no = pi.shape
        m = asg["mask"]
        b, a, gj, gi = asg["b"], asg["a"], asg["gj"], asg["gi"]
        b_safe = jnp.where(m, jnp.clip(b, 0, B - 1), B)  # invalid -> trash row
        vals = jnp.concatenate(
            [w[:, None], w[:, None] * asg["tbox"],
             (w * asg["cls"].astype(jnp.float32))[:, None]], axis=1)
        smap = jnp.zeros((B + 1, H, W, na, 6), jnp.float32)
        smap = jax.lax.stop_gradient(
            smap.at[b_safe, gj, gi, a].add(vals)[:B])
        w_map = smap[..., 0]
        pos = w_map > 0
        wsafe = jnp.maximum(w_map, 1e-9)
        tbox = jnp.where(pos[..., None], smap[..., 1:5] / wsafe[..., None],
                         jnp.array([0.0, 0.0, 1.0, 1.0], jnp.float32))
        tcls_idx = jnp.round(smap[..., 5] / wsafe).astype(jnp.int32)

        # upcast per-slice (NOT the whole map: the converts fuse into each
        # consumer's elementwise chain; a monolithic f32 map materializes)
        awh = self.anchors[i][None, None, None, :, :]
        pxy = jax.nn.sigmoid(pi[..., 0:2].astype(jnp.float32)) * 2.0 - 0.5
        pwh = (jax.nn.sigmoid(pi[..., 2:4].astype(jnp.float32)) * 2.0) ** 2 * awh
        pbox = jnp.concatenate([pxy, pwh], axis=-1)
        iou = bbox_iou(pbox, tbox, format="xywh", iou_type="ciou")  # (B,H,W,na)
        wsum = jnp.maximum(jnp.sum(w_map), 1e-9)
        lbox = jnp.sum((1.0 - iou) * w_map) / wsum

        # objectness target = detached positive IoU at matched cells (the
        # winner's IoU; the exact path takes max over colliding assignments)
        score_iou = jnp.where(pos, jnp.clip(jax.lax.stop_gradient(iou), 0.0, None), 0.0)
        obj_bce = self._cls_obj_bce(pi[..., 4].astype(jnp.float32), score_iou)
        if img_weight is not None:
            lobj = masked_mean(obj_bce, img_weight) * self.balance[i]
        else:
            lobj = jnp.mean(obj_bce) * self.balance[i]

        lcls = jnp.zeros((), jnp.float32)
        if self.nc > 1:
            t_cls = self.cn + (self.cp - self.cn) * jax.nn.one_hot(
                tcls_idx, self.nc, dtype=jnp.float32)
            cls_bce = self._cls_obj_bce(pi[..., 5:].astype(jnp.float32), t_cls)
            lcls = jnp.sum(cls_bce * w_map[..., None]) / (wsum * self.nc)
        return lbox, lobj, lcls

    def __call__(self, predictions: Sequence[jnp.ndarray], targets, mask,
                 img_weight=None):
        """Returns (total_loss, aux) where aux = [lbox, lobj, lcls] (detached values).

        img_weight: optional (B,) float per-image loss weights. The BatchLoader pads
        the last partial batch with wrap-around duplicates (dataset.py); weighting
        those rows 0 removes their double gradient contribution while their pixels
        still feed BatchNorm statistics (ADVICE round 2)."""
        targets = jnp.asarray(targets, jnp.float32)
        mask = jnp.asarray(mask, bool)
        lbox = jnp.zeros((), jnp.float32)
        lobj = jnp.zeros((), jnp.float32)
        lcls = jnp.zeros((), jnp.float32)

        for i, pi in enumerate(predictions):
            # Keep pi in its native dtype (bf16 under the shipped train step)
            # and upcast only at the use sites (the gathered K rows and the
            # objectness plane). Upcasting the whole (B, H, W, na, no) tensor
            # costs a full f32 materialization forward AND makes autodiff
            # assemble the slice/gather cotangents (pad + scatter + add) in
            # f32 — ~1.2 ms of the 32 ms train step @640 b16
            # (profiles/r4s1_train640: pad.109 + reshape.1268). The conv
            # backward consumes a bf16 cotangent anyway, so f32 assembly
            # bought nothing; the loss arithmetic itself stays f32.
            B, H, W, na, no = pi.shape
            asg = build_targets_level(
                targets, mask, self.anchors[i], (H, W), self.hyp["anchor_t"]
            )
            b, a, gj, gi = asg["b"], asg["a"], asg["gj"], asg["gi"]
            m = asg["mask"]
            # per-assignment weights: padding mask, optionally scaled per image
            w = m.astype(jnp.float32)
            if img_weight is not None:
                w = w * img_weight[jnp.clip(b, 0, B - 1)]

            if self.dense:
                lb, lo, lc = self._level_dense(pi, asg, w, i, img_weight)
                lbox, lobj, lcls = lbox + lb, lobj + lo, lcls + lc
                continue

            # gather matched predictions: (K, no)
            ps = pi[b, gj, gi, a].astype(jnp.float32)

            pxy = jax.nn.sigmoid(ps[:, 0:2]) * 2.0 - 0.5
            pwh = (jax.nn.sigmoid(ps[:, 2:4]) * 2.0) ** 2 * asg["anchor_wh"]
            pbox = jnp.concatenate([pxy, pwh], axis=1)
            iou = bbox_iou(pbox, asg["tbox"], format="xywh", iou_type="ciou")
            lbox = lbox + masked_mean(1.0 - iou, w)

            # objectness target = detached positive IoU at matched cells
            score_iou = jnp.clip(jax.lax.stop_gradient(iou), 0.0, None)
            tobj = jnp.zeros((B, H, W, na), jnp.float32)
            b_safe = jnp.where(m, b, B)  # OOB -> dropped
            tobj = tobj.at[b_safe, gj, gi, a].max(score_iou, mode="drop")
            obj_bce = self._cls_obj_bce(pi[..., 4].astype(jnp.float32), tobj)
            if img_weight is not None:
                lobj = lobj + masked_mean(obj_bce, img_weight) * self.balance[i]
            else:
                lobj = lobj + jnp.mean(obj_bce) * self.balance[i]

            if self.nc > 1:
                t_cls = jnp.full((ps.shape[0], self.nc), self.cn, jnp.float32)
                t_cls = t_cls.at[jnp.arange(ps.shape[0]), asg["cls"]].set(self.cp)
                lcls = lcls + masked_mean(self._cls_obj_bce(ps[:, 5:], t_cls), w)

        lbox = lbox * self.hyp["box"]
        lobj = lobj * self.hyp["obj"]
        lcls = lcls * self.hyp["cls"]
        total = lbox + lobj + lcls
        aux = jax.lax.stop_gradient(jnp.stack([lbox, lobj, lcls]))
        return total, aux


class AerialDetectionLoss:
    """Size-aware aerial loss (reference functions.py:213-312), fixed-shape.

    Per level: assign each target to its best-IoU anchor when IoU > iou_thres; CIoU box
    loss + modulated-BCE obj/cls; targets smaller than 64^2/(gw*gh) grid-area get their
    box loss re-added with `scales[3]` (default 2.0).
    """

    def __init__(
        self,
        anchors,
        num_classes: int,
        scales: Tuple[float, float, float, float] = (0.5, 0.5, 1.0, 2.0),
        iou_thres: float = 0.2,
    ):
        self.anchors = jnp.asarray(anchors, jnp.float32)
        self.nc = num_classes
        self.scales = scales
        self.iou_thres = iou_thres

    def __call__(self, predictions, targets, mask):
        targets = jnp.asarray(targets, jnp.float32)
        mask = jnp.asarray(mask, bool)
        lbox = jnp.zeros((), jnp.float32)
        lobj = jnp.zeros((), jnp.float32)
        lcls = jnp.zeros((), jnp.float32)

        for i, pi in enumerate(predictions):
            pi = pi.astype(jnp.float32)
            B, H, W, na, no = pi.shape
            gain = jnp.array([1.0, 1.0, W, H, W, H], jnp.float32)
            t = targets * gain

            # wh-IoU of each target against this level's anchors (shape match score)
            twh = t[:, 4:6]  # (M, 2)
            awh = self.anchors[i]  # (na, 2)
            inter = jnp.minimum(twh[:, None, :], awh[None, :, :]).prod(-1)
            union = twh.prod(-1)[:, None] + awh.prod(-1)[None, :] - inter
            anchor_iou = inter / (union + 1e-9)  # (M, na)
            best_a = jnp.argmax(anchor_iou, axis=1)
            best_iou = jnp.max(anchor_iou, axis=1)
            m = mask & (best_iou > self.iou_thres)

            gi = jnp.clip(t[:, 2].astype(jnp.int32), 0, W - 1)
            gj = jnp.clip(t[:, 3].astype(jnp.int32), 0, H - 1)
            b = t[:, 0].astype(jnp.int32)

            ps = pi[b, gj, gi, best_a]  # (M, no)
            pxy = jax.nn.sigmoid(ps[:, 0:2]) * 2.0 - 0.5 + jnp.stack(
                [gi.astype(jnp.float32), gj.astype(jnp.float32)], 1
            )
            pwh = (jax.nn.sigmoid(ps[:, 2:4]) * 2.0) ** 2 * awh[best_a]
            pbox = jnp.concatenate([pxy, pwh], 1)
            iou = bbox_iou(pbox, t[:, 2:6], format="xywh", iou_type="ciou")
            lbox = lbox + masked_mean(1.0 - iou, m) * self.scales[0]

            # small-object extra term (functions.py:299-301)
            small = (t[:, 4] * t[:, 5]) < (64.0 * 64.0 / (W * H))
            lbox = lbox + masked_mean(1.0 - iou, m & small) * self.scales[3]

            # objectness: matched cells -> 1, everything else -> 0
            tobj = jnp.zeros((B, H, W, na), jnp.float32)
            b_safe = jnp.where(m, b, B)
            tobj = tobj.at[b_safe, gj, gi, best_a].max(1.0, mode="drop")
            lobj = lobj + jnp.mean(modulated_bce(pi[..., 4], tobj)) * self.scales[1]

            if self.nc > 1:
                cls_idx = jnp.clip(targets[:, 1].astype(jnp.int32), 0, self.nc - 1)
                t_cls = jax.nn.one_hot(cls_idx, self.nc)
                lcls = lcls + masked_mean(modulated_bce(ps[:, 5:], t_cls), m) * self.scales[2]

        total = lbox + lobj + lcls
        return total, jax.lax.stop_gradient(jnp.stack([lbox, lobj, lcls]))
