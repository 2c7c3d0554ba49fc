"""Tests for the fixed-shape NMS against a brute-force reference implementation."""
import numpy as np
import jax.numpy as jnp

from skyeye_tpu.ops import non_max_suppression, nms_single
from skyeye_tpu.ops.boxes import xywh2xyxy


def reference_nms(boxes, scores, iou_thres):
    """O(n^2) greedy NMS, numpy (mirrors torchvision.ops.nms semantics)."""
    order = np.argsort(-scores)
    keep = []
    suppressed = np.zeros(len(boxes), bool)
    for i in order:
        if suppressed[i] or scores[i] <= 0:
            continue
        keep.append(i)
        x1 = np.maximum(boxes[i, 0], boxes[:, 0])
        y1 = np.maximum(boxes[i, 1], boxes[:, 1])
        x2 = np.minimum(boxes[i, 2], boxes[:, 2])
        y2 = np.minimum(boxes[i, 3], boxes[:, 3])
        inter = np.clip(x2 - x1, 0, None) * np.clip(y2 - y1, 0, None)
        area_i = (boxes[i, 2] - boxes[i, 0]) * (boxes[i, 3] - boxes[i, 1])
        areas = (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])
        iou = inter / (area_i + areas - inter + 1e-7)
        suppressed |= iou > iou_thres
    return keep


def make_preds(rng, n=200, nc=5):
    cx = rng.uniform(50, 600, n)
    cy = rng.uniform(50, 600, n)
    w = rng.uniform(5, 80, n)
    h = rng.uniform(5, 80, n)
    obj = rng.uniform(0, 1, n)
    cls = rng.uniform(0, 1, (n, nc))
    return np.stack([cx, cy, w, h, obj], 1).astype(np.float32), cls.astype(np.float32)


def test_nms_matches_reference_best_class():
    rng = np.random.default_rng(3)
    base, cls = make_preds(rng)
    pred = np.concatenate([base, cls], 1)
    conf, iou_t = 0.25, 0.45

    det, n = nms_single(jnp.asarray(pred), conf_thres=conf, iou_thres=iou_t,
                        multi_label=False, max_det=200, max_nms=512)
    det, n = np.asarray(det), int(n)

    # Build reference candidate set: best class, conf = obj * cls
    scores_full = base[:, 4:5] * cls
    best_cls = scores_full.argmax(1)
    best_score = scores_full.max(1)
    mask = (base[:, 4] > conf) & (best_score > conf)
    boxes = np.asarray(xywh2xyxy(jnp.asarray(base[:, :4])))
    off_boxes = boxes + best_cls[:, None] * 7680.0
    sc = np.where(mask, best_score, 0)
    keep = reference_nms(off_boxes, sc, iou_t)

    assert n == len(keep)
    ref_sorted = sorted(keep, key=lambda i: -best_score[i])
    for row, i in zip(det[:n], ref_sorted):
        np.testing.assert_allclose(row[:4], boxes[i], rtol=1e-4, atol=1e-2)
        assert abs(row[4] - best_score[i]) < 1e-5
        assert int(row[5]) == best_cls[i]


def test_nms_multilabel_count_and_order():
    rng = np.random.default_rng(4)
    base, cls = make_preds(rng, n=100, nc=3)
    pred = np.concatenate([base, cls], 1)
    det, n = nms_single(jnp.asarray(pred), conf_thres=0.4, iou_thres=0.5,
                        multi_label=True, max_det=200, max_nms=512)
    det, n = np.asarray(det), int(n)
    assert n > 0
    # scores sorted descending among valid rows
    s = det[:n, 4]
    assert np.all(np.diff(s) <= 1e-6)
    # all rows above conf threshold
    assert np.all(s > 0.4)
    # padding rows are zero
    assert np.all(det[n:] == 0)


def test_nms_class_filter_and_agnostic():
    rng = np.random.default_rng(5)
    base, cls = make_preds(rng, n=80, nc=4)
    pred = np.concatenate([base, cls], 1)[None]  # batch of 1
    out = non_max_suppression(pred, conf_thres=0.2, iou_thres=0.5, classes=[1, 2])
    assert len(out) == 1
    if len(out[0]):
        assert set(np.unique(out[0][:, 5].astype(int))) <= {1, 2}

    # agnostic suppresses across classes: two identical boxes, different classes
    two = np.zeros((2, 9), np.float32)
    two[:, :4] = [100, 100, 40, 40]
    two[:, 4] = 0.9
    two[0, 5] = 0.9
    two[1, 6] = 0.8
    det, n = nms_single(jnp.asarray(two), conf_thres=0.1, iou_thres=0.5,
                        multi_label=False, agnostic=True, max_det=10, max_nms=16)
    assert int(n) == 1
    det, n = nms_single(jnp.asarray(two), conf_thres=0.1, iou_thres=0.5,
                        multi_label=False, agnostic=False, max_det=10, max_nms=16)
    assert int(n) == 2


def test_nms_empty():
    pred = np.zeros((1, 50, 10), np.float32)
    out = non_max_suppression(pred, conf_thres=0.25)
    assert len(out) == 1 and len(out[0]) == 0


def test_nms_approx_topk_close_to_exact():
    """approx_topk path (exact fallback on CPU) matches the exact path."""
    rng = np.random.default_rng(9)
    base, cls = make_preds(rng, n=300, nc=4)
    pred = np.concatenate([base, cls], 1)
    d1, n1 = nms_single(jnp.asarray(pred), conf_thres=0.3, iou_thres=0.5,
                        max_det=64, max_nms=256)
    d2, n2 = nms_single(jnp.asarray(pred), conf_thres=0.3, iou_thres=0.5,
                        max_det=64, max_nms=256, approx_topk=True)
    assert int(n2) >= int(n1) * 0.9  # allow small recall loss on TPU
    # on CPU approx_max_k is exact -> identical results
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d2), atol=1e-5)


def test_serving_max_nms_routing():
    """The conf-aware candidate budget: serving confidences get the small
    budget (sizes the whole post-head tail; measured −0.01 pt on converged
    weights, profiles/nms_budget_r03.json), eval-like confidences keep the
    large one so mAP protocols see the full candidate set."""
    from skyeye_tpu.ops.nms import (EVAL_MAX_NMS, SERVING_MAX_NMS,
                                    serving_max_nms)

    assert serving_max_nms(0.25) == SERVING_MAX_NMS
    assert serving_max_nms(0.1) == SERVING_MAX_NMS
    assert serving_max_nms(0.001) == EVAL_MAX_NMS  # cli/validate protocol
    assert serving_max_nms(0.099) == EVAL_MAX_NMS
    # budgets stay lane-aligned for the Pallas kernel's 8x128 pad path
    assert SERVING_MAX_NMS % 1024 == 0 and EVAL_MAX_NMS % 1024 == 0
