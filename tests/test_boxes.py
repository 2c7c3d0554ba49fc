"""Unit tests for box coordinate utilities and the IoU family."""
import numpy as np
import jax.numpy as jnp
import pytest

from skyeye_tpu.ops import (
    bbox_iou,
    box_iou,
    clip_boxes,
    scale_boxes,
    xywh2xyxy,
    xyxy2xywh,
)


def brute_iou(b1, b2):
    x1 = max(b1[0], b2[0])
    y1 = max(b1[1], b2[1])
    x2 = min(b1[2], b2[2])
    y2 = min(b1[3], b2[3])
    inter = max(x2 - x1, 0) * max(y2 - y1, 0)
    a1 = (b1[2] - b1[0]) * (b1[3] - b1[1])
    a2 = (b2[2] - b2[0]) * (b2[3] - b2[1])
    return inter / (a1 + a2 - inter + 1e-7)


def test_xywh_roundtrip():
    rng = np.random.default_rng(0)
    xywh = rng.uniform(10, 100, size=(32, 4)).astype(np.float32)
    back = np.asarray(xyxy2xywh(xywh2xyxy(jnp.asarray(xywh))))
    np.testing.assert_allclose(back, xywh, rtol=1e-5, atol=1e-4)


def test_xywh2xyxy_values():
    out = np.asarray(xywh2xyxy(jnp.array([[10.0, 20.0, 4.0, 6.0]])))
    np.testing.assert_allclose(out, [[8.0, 17.0, 12.0, 23.0]])


def test_box_iou_vs_brute_force():
    rng = np.random.default_rng(1)
    a = rng.uniform(0, 50, size=(7, 2))
    b = rng.uniform(0, 50, size=(9, 2))
    boxes1 = np.concatenate([a, a + rng.uniform(1, 30, size=(7, 2))], 1).astype(np.float32)
    boxes2 = np.concatenate([b, b + rng.uniform(1, 30, size=(9, 2))], 1).astype(np.float32)
    got = np.asarray(box_iou(jnp.asarray(boxes1), jnp.asarray(boxes2)))
    for i in range(7):
        for j in range(9):
            assert abs(got[i, j] - brute_iou(boxes1[i], boxes2[j])) < 1e-4


@pytest.mark.parametrize("iou_type", ["standard", "giou", "diou", "ciou"])
def test_bbox_iou_properties(iou_type):
    # identical boxes -> IoU 1 for all variants
    box = jnp.array([10.0, 10.0, 20.0, 20.0])
    v = float(bbox_iou(box, box, iou_type=iou_type))
    assert abs(v - 1.0) < 1e-3
    # disjoint boxes -> standard IoU 0; penalized variants < 0
    far = jnp.array([100.0, 100.0, 110.0, 110.0])
    v2 = float(bbox_iou(box, far, iou_type=iou_type))
    if iou_type == "standard":
        assert abs(v2) < 1e-6
    else:
        assert v2 < 0


def test_bbox_iou_xywh_format():
    b1 = jnp.array([15.0, 15.0, 10.0, 10.0])  # xywh == [10,10,20,20] xyxy
    b2 = jnp.array([10.0, 10.0, 20.0, 20.0])
    v = float(bbox_iou(b1, b2, format="xywh", iou_type="standard"))
    ref = brute_iou([10, 10, 20, 20], [0, 0, 20, 20])
    assert abs(v - ref) < 1e-4


def test_clip_boxes():
    boxes = jnp.array([[-5.0, -5.0, 700.0, 700.0]])
    out = np.asarray(clip_boxes(boxes, (480, 640)))
    np.testing.assert_allclose(out, [[0.0, 0.0, 640.0, 480.0]])


def test_scale_boxes_letterbox_roundtrip():
    # box in a 640x640 letterboxed frame from a 480x640 original: gain=1.0, pad=(0, 80)
    boxes = jnp.array([[100.0, 180.0, 200.0, 280.0]])
    out = np.asarray(scale_boxes((640, 640), boxes, (480, 640)))
    np.testing.assert_allclose(out, [[100.0, 100.0, 200.0, 200.0]], atol=1e-4)


def test_normalized_conversions_roundtrip():
    from skyeye_tpu.ops import xywhn2xyxy, xyxy2xywhn

    rng = np.random.default_rng(2)
    n = 16
    xywhn = np.stack([
        rng.uniform(0.2, 0.8, n), rng.uniform(0.2, 0.8, n),
        rng.uniform(0.05, 0.3, n), rng.uniform(0.05, 0.3, n),
    ], 1).astype(np.float32)
    xyxy = xywhn2xyxy(jnp.asarray(xywhn), w=640, h=480)
    back = np.asarray(xyxy2xywhn(xyxy, w=640, h=480))
    np.testing.assert_allclose(back, xywhn, rtol=1e-4, atol=1e-4)
    # padding shifts
    shifted = np.asarray(xywhn2xyxy(jnp.asarray(xywhn), w=640, h=480, padw=10, padh=20))
    np.testing.assert_allclose(shifted[:, 0] - np.asarray(xyxy)[:, 0], 10, atol=1e-4)
    np.testing.assert_allclose(shifted[:, 1] - np.asarray(xyxy)[:, 1], 20, atol=1e-4)
