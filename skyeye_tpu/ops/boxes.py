"""Box coordinate utilities and the IoU family, pure JAX.

Capability parity targets (reference, read-only at /root/reference):
  - `bbox_iou` IoU/GIoU/DIoU/CIoU family: skyeye/core/loss/functions.py:26-111 and
    skyeye/utils/metrics.py:47-121 (two near-duplicate torch APIs, unified here).
  - pairwise `box_iou`: skyeye/utils/metrics.py:17-44.
  - `xywh2xyxy` / `xyxy2xywh` / `scale_boxes` / `clip_boxes`: declared-but-missing in the
    reference (imported at skyeye/cli/validate.py:24-25, skyeye/cli/detect.py:26; see
    SURVEY.md §2.7#4) — implemented here with YOLOv5-convention semantics.

All functions are shape-polymorphic pure functions over the last axis and are safe to use
inside jit / pallas host code. They accept jnp or np arrays.
"""
from __future__ import annotations

import math
from typing import Tuple

import jax
import jax.numpy as jnp


def xywh2xyxy(x):
    """(cx, cy, w, h) -> (x1, y1, x2, y2) on the last axis."""
    cx, cy, w, h = x[..., 0], x[..., 1], x[..., 2], x[..., 3]
    return jnp.stack([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], axis=-1)


def xyxy2xywh(x):
    """(x1, y1, x2, y2) -> (cx, cy, w, h) on the last axis."""
    x1, y1, x2, y2 = x[..., 0], x[..., 1], x[..., 2], x[..., 3]
    return jnp.stack([(x1 + x2) / 2, (y1 + y2) / 2, x2 - x1, y2 - y1], axis=-1)


def xywhn2xyxy(x, w: float, h: float, padw: float = 0.0, padh: float = 0.0):
    """Normalized (cx, cy, w, h) -> pixel (x1, y1, x2, y2) for a (h, w) image."""
    cx, cy, bw, bh = x[..., 0], x[..., 1], x[..., 2], x[..., 3]
    return jnp.stack(
        [
            w * (cx - bw / 2) + padw,
            h * (cy - bh / 2) + padh,
            w * (cx + bw / 2) + padw,
            h * (cy + bh / 2) + padh,
        ],
        axis=-1,
    )


def xyxy2xywhn(x, w: float, h: float, clip: bool = False, eps: float = 0.0):
    """Pixel (x1, y1, x2, y2) -> normalized (cx, cy, w, h)."""
    if clip:
        x = clip_boxes(x, (h - eps, w - eps))
    x1, y1, x2, y2 = x[..., 0], x[..., 1], x[..., 2], x[..., 3]
    return jnp.stack(
        [(x1 + x2) / 2 / w, (y1 + y2) / 2 / h, (x2 - x1) / w, (y2 - y1) / h], axis=-1
    )


def clip_boxes(boxes, shape: Tuple[float, float]):
    """Clip xyxy boxes to image bounds. ``shape`` is (height, width)."""
    h, w = shape
    return jnp.stack(
        [
            jnp.clip(boxes[..., 0], 0, w),
            jnp.clip(boxes[..., 1], 0, h),
            jnp.clip(boxes[..., 2], 0, w),
            jnp.clip(boxes[..., 3], 0, h),
        ],
        axis=-1,
    )


def scale_boxes(img1_shape, boxes, img0_shape, ratio_pad=None):
    """Rescale xyxy boxes from a letterboxed ``img1_shape`` back to native ``img0_shape``.

    Mirrors the YOLOv5 convention the reference CLI relies on
    (skyeye/cli/validate.py:274-280, skyeye/cli/detect.py:160).
    """
    if ratio_pad is None:
        gain = min(img1_shape[0] / img0_shape[0], img1_shape[1] / img0_shape[1])
        pad = (
            (img1_shape[1] - img0_shape[1] * gain) / 2,
            (img1_shape[0] - img0_shape[0] * gain) / 2,
        )
    else:
        gain = ratio_pad[0][0]
        pad = ratio_pad[1]
    boxes = jnp.stack(
        [
            (boxes[..., 0] - pad[0]) / gain,
            (boxes[..., 1] - pad[1]) / gain,
            (boxes[..., 2] - pad[0]) / gain,
            (boxes[..., 3] - pad[1]) / gain,
        ],
        axis=-1,
    )
    return clip_boxes(boxes, img0_shape)


def box_iou(box1, box2, eps: float = 1e-7):
    """Pairwise IoU between two xyxy box sets: (N, 4) x (M, 4) -> (N, M).

    Parity: skyeye/utils/metrics.py:17-44.
    """
    a1, a2 = jnp.split(box1[:, None, :], 2, axis=-1)  # (N,1,2) mins / maxes
    b1, b2 = jnp.split(box2[None, :, :], 2, axis=-1)  # (1,M,2)
    inter = jnp.clip(jnp.minimum(a2, b2) - jnp.maximum(a1, b1), 0, None).prod(-1)
    area1 = jnp.clip(a2 - a1, 0, None).prod(-1)
    area2 = jnp.clip(b2 - b1, 0, None).prod(-1)
    return inter / (area1 + area2 - inter + eps)


def bbox_iou(box1, box2, format: str = "xyxy", iou_type: str = "standard", eps: float = 1e-7):
    """Elementwise IoU family between broadcast-compatible box arrays.

    ``iou_type`` in {"standard", "giou", "diou", "ciou"}. Numerics follow the reference
    loss-side implementation exactly (skyeye/core/loss/functions.py:26-111), including its
    asymmetric `+eps` on heights only and the stop-gradient on the CIoU alpha term.
    """
    if format == "xywh":
        box1 = xywh2xyxy(box1)
        box2 = xywh2xyxy(box2)

    b1_x1, b1_y1, b1_x2, b1_y2 = box1[..., 0], box1[..., 1], box1[..., 2], box1[..., 3]
    b2_x1, b2_y1, b2_x2, b2_y2 = box2[..., 0], box2[..., 1], box2[..., 2], box2[..., 3]

    inter = jnp.clip(jnp.minimum(b1_x2, b2_x2) - jnp.maximum(b1_x1, b2_x1), 0, None) * jnp.clip(
        jnp.minimum(b1_y2, b2_y2) - jnp.maximum(b1_y1, b2_y1), 0, None
    )

    w1, h1 = b1_x2 - b1_x1, b1_y2 - b1_y1 + eps
    w2, h2 = b2_x2 - b2_x1, b2_y2 - b2_y1 + eps
    union = w1 * h1 + w2 * h2 - inter + eps
    iou = inter / union

    if iou_type == "standard":
        return iou

    cw = jnp.maximum(b1_x2, b2_x2) - jnp.minimum(b1_x1, b2_x1)
    ch = jnp.maximum(b1_y2, b2_y2) - jnp.minimum(b1_y1, b2_y1)

    if iou_type == "giou":
        c_area = cw * ch + eps
        return iou - (c_area - union) / c_area

    if iou_type in ("diou", "ciou"):
        c2 = cw**2 + ch**2 + eps
        rho2 = ((b1_x1 + b1_x2 - b2_x1 - b2_x2) ** 2 + (b1_y1 + b1_y2 - b2_y1 - b2_y2) ** 2) / 4
        if iou_type == "diou":
            return iou - rho2 / c2
        v = (4 / math.pi**2) * (jnp.arctan(w2 / h2) - jnp.arctan(w1 / h1)) ** 2
        alpha = jax.lax.stop_gradient(v / (v - iou + (1 + eps)))
        return iou - (rho2 / c2 + v * alpha)

    return iou
