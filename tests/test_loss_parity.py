"""Differential loss test: the fixed-shape masked ComputeLoss must produce the same
value as a faithful torch re-implementation of the reference's DYNAMIC algorithm
(functions.py:315-505 semantics with its §8 defects repaired: na derived from
anchors, head metadata passed directly instead of model.model[-1]).

This validates the SURVEY.md §7 hard part: "build_targets vectorization ... masked,
padded redesign that is bit-equivalent in loss value".
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp

from skyeye_tpu.config import DEFAULT_ANCHORS, DEFAULT_HYP
from skyeye_tpu.losses import ComputeLoss


def torch_reference_loss(preds_nhwa, targets, anchors, nc, hyp):
    """Dynamic-gather YOLOv5-convention loss, torch (reference semantics)."""
    import math

    def bce(pred, true):
        return torch.nn.functional.binary_cross_entropy_with_logits(
            pred, true, reduction="none"
        )

    def focal(pred, true, gamma=1.5, alpha=0.25):
        loss = bce(pred, true)
        p = torch.sigmoid(pred)
        p_t = true * p + (1 - true) * (1 - p)
        af = true * alpha + (1 - true) * (1 - alpha)
        return (af * (1.0 - p_t) ** gamma * loss).mean()

    def ciou(box1, box2, eps=1e-7):
        # xywh elementwise CIoU (reference functions.py:26-111)
        b1x1 = box1[:, 0] - box1[:, 2] / 2
        b1y1 = box1[:, 1] - box1[:, 3] / 2
        b1x2 = box1[:, 0] + box1[:, 2] / 2
        b1y2 = box1[:, 1] + box1[:, 3] / 2
        b2x1 = box2[:, 0] - box2[:, 2] / 2
        b2y1 = box2[:, 1] - box2[:, 3] / 2
        b2x2 = box2[:, 0] + box2[:, 2] / 2
        b2y2 = box2[:, 1] + box2[:, 3] / 2
        inter = (torch.min(b1x2, b2x2) - torch.max(b1x1, b2x1)).clamp(0) * (
            torch.min(b1y2, b2y2) - torch.max(b1y1, b2y1)
        ).clamp(0)
        w1, h1 = b1x2 - b1x1, b1y2 - b1y1 + eps
        w2, h2 = b2x2 - b2x1, b2y2 - b2y1 + eps
        union = w1 * h1 + w2 * h2 - inter + eps
        iou = inter / union
        cw = torch.max(b1x2, b2x2) - torch.min(b1x1, b2x1)
        ch = torch.max(b1y2, b2y2) - torch.min(b1y1, b2y1)
        c2 = cw**2 + ch**2 + eps
        rho2 = ((b1x1 + b1x2 - b2x1 - b2x2) ** 2 + (b1y1 + b1y2 - b2y1 - b2y2) ** 2) / 4
        v = (4 / math.pi**2) * torch.pow(torch.atan(w2 / h2) - torch.atan(w1 / h1), 2)
        with torch.no_grad():
            alpha = v / (v - iou + (1 + eps))
        return iou - (rho2 / c2 + v * alpha)

    anchors = torch.tensor(anchors, dtype=torch.float32)  # (nl, na, 2)
    nl, na = anchors.shape[0], anchors.shape[1]
    balance = [4.0, 1.0, 0.4]
    g = 0.5
    off = torch.tensor(
        [[0, 0], [1, 0], [0, 1], [-1, 0], [0, -1]], dtype=torch.float32
    ) * g

    # preds: list of (B, H, W, na, no) numpy -> torch (B, na, H, W, no)
    preds = [torch.tensor(p).permute(0, 3, 1, 2, 4).contiguous() for p in preds_nhwa]
    targets = torch.tensor(targets, dtype=torch.float32)
    nt = targets.shape[0]

    # build_targets (functions.py:428-505)
    tcls, tbox, indices, anch = [], [], [], []
    gain = torch.ones(7)
    ai = torch.arange(na).float().view(na, 1).repeat(1, nt)
    t_all = torch.cat((targets.repeat(na, 1, 1), ai[:, :, None]), 2)

    for i in range(nl):
        anchors_i = anchors[i]
        shape = preds[i].shape  # (B, na, H, W, no)
        gain[2:6] = torch.tensor([shape[3], shape[2], shape[3], shape[2]]).float()
        t = t_all * gain
        if nt:
            r = t[..., 4:6] / anchors_i[:, None]
            j = torch.max(r, 1.0 / r).max(2)[0] < hyp["anchor_t"]
            t = t[j]
            gxy = t[:, 2:4]
            gxi = gain[[2, 3]] - gxy
            j, k = ((gxy % 1.0 < g) & (gxy > 1.0)).T
            l, m = ((gxi % 1.0 < g) & (gxi > 1.0)).T
            j = torch.stack((torch.ones_like(j), j, k, l, m))
            t = t.repeat((5, 1, 1))[j]
            offsets = (torch.zeros_like(gxy)[None] + off[:, None])[j]
        else:
            t = t_all[0]
            offsets = 0
        bc, gxy, gwh, a = t.chunk(4, 1)
        a, (b, c) = a.long().view(-1), bc.long().T
        gij = (gxy - offsets).long()
        gi, gj = gij.T
        gj = gj.clamp_(0, shape[2] - 1)
        gi = gi.clamp_(0, shape[3] - 1)
        indices.append((b, a, gj, gi))
        tbox.append(torch.cat((gxy - torch.stack([gi, gj], 1).float(), gwh), 1))
        anch.append(anchors_i[a])
        tcls.append(c)

    lcls = torch.zeros(1)
    lbox = torch.zeros(1)
    lobj = torch.zeros(1)
    for i, pi in enumerate(preds):
        b, a, gj, gi = indices[i]
        tobj = torch.zeros_like(pi[..., 0])
        n = b.shape[0]
        if n:
            ps = pi[b, a, gj, gi]
            pxy = ps[:, :2].sigmoid() * 2 - 0.5
            pwh = (ps[:, 2:4].sigmoid() * 2) ** 2 * anch[i]
            pbox = torch.cat((pxy, pwh), 1)
            iou = ciou(pbox, tbox[i])
            lbox += (1.0 - iou).mean()
            score_iou = torch.clamp(iou.detach(), 0)
            # .max-combining duplicates to mirror the deterministic jax scatter
            flat = ((b * pi.shape[1] + a) * pi.shape[2] + gj) * pi.shape[3] + gi
            tobj_flat = tobj.view(-1)
            tobj_flat.scatter_reduce_(0, flat, score_iou, reduce="amax")
            tobj = tobj_flat.view_as(tobj)
            if nc > 1:
                t = torch.zeros_like(ps[:, 5:])
                t[range(n), tcls[i]] = 1.0
                lcls += focal(ps[:, 5:], t)
        lobj += focal(pi[..., 4], tobj) * balance[i]
    lbox *= hyp["box"]
    lobj *= hyp["obj"]
    lcls *= hyp["cls"]
    return float(lbox), float(lobj), float(lcls)


def test_masked_loss_matches_dynamic_reference():
    rng = np.random.default_rng(0)
    nc, B, na = 6, 3, 3
    sizes = [(16, 16), (8, 8), (4, 4)]
    preds = [rng.normal(0, 1.0, (B, h, w, na, nc + 5)).astype(np.float32)
             for h, w in sizes]

    # random targets, including edge-adjacent and large boxes
    rows = []
    for b in range(B):
        for _ in range(rng.integers(2, 6)):
            rows.append([
                b,
                rng.integers(0, nc),
                rng.uniform(0.05, 0.95),
                rng.uniform(0.05, 0.95),
                rng.uniform(0.03, 0.5),
                rng.uniform(0.03, 0.5),
            ])
    targets = np.array(rows, np.float32)

    hyp = dict(DEFAULT_HYP)
    anchors = np.asarray(DEFAULT_ANCHORS, np.float32)

    ref_box, ref_obj, ref_cls = torch_reference_loss(preds, targets, anchors, nc, hyp)

    # pad for the fixed-shape version
    M = 64
    padded = np.zeros((M, 6), np.float32)
    padded[: len(targets)] = targets
    mask = np.zeros((M,), bool)
    mask[: len(targets)] = True

    loss_fn = ComputeLoss(jnp.asarray(anchors), nc, hyp=hyp)
    total, aux = loss_fn([jnp.asarray(p) for p in preds], jnp.asarray(padded),
                         jnp.asarray(mask))
    got_box, got_obj, got_cls = (float(x) for x in aux)

    assert abs(got_box - ref_box) < 2e-4, (got_box, ref_box)
    assert abs(got_obj - ref_obj) < 2e-4, (got_obj, ref_obj)
    assert abs(got_cls - ref_cls) < 2e-4, (got_cls, ref_cls)


def test_masked_loss_matches_dynamic_reference_empty_targets():
    rng = np.random.default_rng(1)
    nc = 4
    preds = [rng.normal(0, 1.0, (2, h, w, 3, nc + 5)).astype(np.float32)
             for h, w in [(8, 8), (4, 4), (2, 2)]]
    hyp = dict(DEFAULT_HYP)
    anchors = np.asarray(DEFAULT_ANCHORS, np.float32)
    ref = torch_reference_loss(preds, np.zeros((0, 6), np.float32), anchors, nc, hyp)

    loss_fn = ComputeLoss(jnp.asarray(anchors), nc, hyp=hyp)
    _, aux = loss_fn([jnp.asarray(p) for p in preds],
                     jnp.zeros((8, 6)), jnp.zeros((8,), bool))
    for got, want in zip(aux, ref):
        assert abs(float(got) - want) < 2e-4
