"""COCO-protocol evaluator tests (utils/coco_eval.py)."""
import numpy as np

from skyeye_tpu.utils.coco_eval import evaluate_coco, gt_from_labels
from skyeye_tpu.utils.metrics import ap_per_class, process_batch


def _box(x, y, w, h):
    return [float(x), float(y), float(w), float(h)]


def test_perfect_predictions_ap1():
    gt, dt = [], []
    for img in range(1, 4):
        for j in range(3):
            b = _box(10 + 40 * j, 20, 30, 30)
            gt.append({"image_id": img, "category_id": j % 2, "bbox": b})
            dt.append({"image_id": img, "category_id": j % 2, "bbox": b,
                       "score": 0.9})
    res = evaluate_coco(gt, dt)
    assert res["AP"] > 0.99 and res["AP50"] > 0.99 and res["AR"] > 0.99


def test_false_positives_lower_precision():
    gt = [{"image_id": 1, "category_id": 0, "bbox": _box(10, 10, 30, 30)}]
    dt = [
        {"image_id": 1, "category_id": 0, "bbox": _box(10, 10, 30, 30), "score": 0.9},
        {"image_id": 1, "category_id": 0, "bbox": _box(200, 200, 30, 30), "score": 0.95},
    ]
    res = evaluate_coco(gt, dt)
    # higher-scored FP comes first: precision at recall 1 is 0.5, AP50 ~ 0.5
    assert 0.4 < res["AP50"] < 0.6


def test_missed_gt_lowers_recall():
    gt = [
        {"image_id": 1, "category_id": 0, "bbox": _box(10, 10, 30, 30)},
        {"image_id": 1, "category_id": 0, "bbox": _box(100, 100, 30, 30)},
    ]
    dt = [{"image_id": 1, "category_id": 0, "bbox": _box(10, 10, 30, 30), "score": 0.9}]
    res = evaluate_coco(gt, dt)
    assert abs(res["AR"] - 0.5) < 1e-6
    assert abs(res["AP50"] - 0.5) < 0.02  # 101-pt interp quantization


def test_localization_quality_separates_thresholds():
    # IoU ~0.6 box: counts at AP50, not at AP75
    gt = [{"image_id": 1, "category_id": 0, "bbox": _box(0, 0, 100, 100)}]
    dt = [{"image_id": 1, "category_id": 0, "bbox": _box(0, 0, 100, 62), "score": 0.9}]
    res = evaluate_coco(gt, dt)
    assert res["AP50"] > 0.9 and res["AP75"] < 0.1


def test_area_ranges():
    gt = [
        {"image_id": 1, "category_id": 0, "bbox": _box(0, 0, 10, 10)},      # small
        {"image_id": 1, "category_id": 0, "bbox": _box(50, 50, 200, 200)},  # large
    ]
    dt = [
        {"image_id": 1, "category_id": 0, "bbox": _box(0, 0, 10, 10), "score": 0.9},
    ]
    small = evaluate_coco(gt, dt, area_rng="small")
    large = evaluate_coco(gt, dt, area_rng="large")
    assert small["AP50"] > 0.99
    assert large["AP50"] < 0.01


def test_gt_from_labels_roundtrip():
    labels = [np.array([[0, 0.5, 0.5, 0.2, 0.4]])]
    gt = gt_from_labels(labels, [(100, 200)])
    assert gt[0]["image_id"] == 1 and gt[0]["category_id"] == 0
    np.testing.assert_allclose(gt[0]["bbox"], [40.0, 60.0, 20.0, 80.0])


def test_agrees_with_internal_ap_machinery():
    """At full recall, COCO AP50 and the internal (YOLOv5-convention) mAP50 agree:
    same matching rule at IoU 0.5 and the same precision envelope. (Below full
    recall the two protocols legitimately diverge — YOLOv5 interpolates precision
    linearly to recall 1.0, COCO zeroes it past max recall — so full-recall data is
    where agreement is the correct expectation.)"""
    rng = np.random.default_rng(0)
    iouv = np.linspace(0.5, 0.95, 10)
    gt_j, dt_j, stats = [], [], []
    for img in range(1, 21):
        n_gt = rng.integers(1, 6)
        boxes = np.zeros((n_gt, 4))
        boxes[:, :2] = rng.uniform(0, 500, (n_gt, 2))
        boxes[:, 2:] = rng.uniform(30, 80, (n_gt, 2))
        labels = np.zeros((n_gt, 5), np.float32)
        labels[:, 1:3] = boxes[:, :2]
        labels[:, 3:5] = boxes[:, :2] + boxes[:, 2:]
        dets = []
        for b in boxes:
            # every GT detected with small jitter (IoU stays > 0.5 at size >= 30)
            jit = rng.uniform(-2, 2, 4)
            x1, y1 = b[0] + jit[0], b[1] + jit[1]
            x2, y2 = b[0] + b[2] + jit[2], b[1] + b[3] + jit[3]
            dets.append([x1, y1, x2, y2, rng.uniform(0.3, 1.0), 0])
        for _ in range(rng.integers(0, 3)):  # false positives
            x, y = rng.uniform(600, 900, 2)
            dets.append([x, y, x + 40, y + 40, rng.uniform(0.05, 0.6), 0])
        det = np.array(dets, np.float32).reshape(-1, 6)

        for b in boxes:
            gt_j.append({"image_id": img, "category_id": 0,
                         "bbox": [float(v) for v in b]})
        for d in det:
            dt_j.append({"image_id": img, "category_id": 0,
                         "bbox": [float(d[0]), float(d[1]),
                                  float(d[2] - d[0]), float(d[3] - d[1])],
                         "score": float(d[4])})
        correct = process_batch(det, labels, iouv)
        stats.append((correct, det[:, 4], det[:, 5], labels[:, 0]))

    correct = np.concatenate([s[0] for s in stats])
    conf = np.concatenate([s[1] for s in stats])
    pred_cls = np.concatenate([s[2] for s in stats])
    target_cls = np.concatenate([s[3] for s in stats])
    _, _, _, _, _, ap, _ = ap_per_class(correct, conf, pred_cls, target_cls,
                                        plot=False)
    internal_map50 = float(ap[:, 0].mean())
    coco = evaluate_coco(gt_j, dt_j)
    assert abs(coco["AP50"] - internal_map50) < 0.03, (coco["AP50"], internal_map50)


def test_crowd_gt_absorbs_duplicate_detections():
    """pycocotools semantics: multiple detections overlapping the same iscrowd GT
    are ALL ignored (matched-to-ignored), not counted as FPs (ADVICE round 2)."""
    from skyeye_tpu.utils.coco_eval import _match_one

    gt_boxes = np.array([[0.0, 0.0, 100.0, 100.0]])  # one crowd region
    gt_ignore = np.array([True])
    # two detections both inside the crowd region
    dt_boxes = np.array([[5.0, 5.0, 90.0, 90.0], [10.0, 10.0, 80.0, 80.0]])
    dt_scores = np.array([0.9, 0.8])
    m, ig, _ = _match_one(dt_boxes, dt_scores, gt_boxes, gt_ignore, max_dets=100)
    # both detections match the crowd GT and are flagged ignored at IoU 0.5 (ti=0)
    assert m[0].all(), "crowd GT must absorb every overlapping detection"
    assert ig[0].all(), "matches to ignored GT must be marked ignored"


def test_real_gt_still_blocks_rematch():
    from skyeye_tpu.utils.coco_eval import _match_one

    gt_boxes = np.array([[0.0, 0.0, 100.0, 100.0]])
    gt_ignore = np.array([False])
    dt_boxes = np.array([[0.0, 0.0, 100.0, 100.0], [1.0, 1.0, 99.0, 99.0]])
    dt_scores = np.array([0.9, 0.8])
    m, ig, _ = _match_one(dt_boxes, dt_scores, gt_boxes, gt_ignore, max_dets=100)
    assert m[0, 0] and not m[0, 1], "a real GT matches only the best detection"
    assert not ig[0].any()
