"""Host-side image augmentation (numpy/cv2) for the training data pipeline.

Capability parity (reference /root/reference/skyeye/core/data/augmentation.py):
  augment_hsv         <- HSV jitter via LUT (augmentation.py:48-86)
  random_perspective  <- combined Center*Perspective*Rotation*Shear*Translate affine
                         warp with box transform + candidate filter (:88-181,314-337)
  flip_lr / flip_ud   <- (:183-206)
  mosaic4             <- 4-image mosaic on a 2s x 2s canvas, random center (:208-271)
  mixup               <- Beta(8, 8) blend (:273-290)
  cutout              <- declared in the reference API (core/data/__init__.py:9) but
                         never implemented (SURVEY.md §2.7#6); YOLOv5-convention here
  AerialAugmentor     <- AerialAugmentation class facade (:15-42), alias kept because
                         the reference's dataset imports that name (dataset.py:17)

The on-device (JAX) equivalents live in skyeye_tpu/data/device_aug.py; these host
versions are the fallback and the source of parity semantics.
"""
from __future__ import annotations

import math
import random
from typing import Dict, Optional, Tuple

import numpy as np

try:
    import cv2
except Exception:  # pragma: no cover
    cv2 = None

from ..config import DEFAULT_HYP


def augment_hsv(img: np.ndarray, hgain: float = 0.015, sgain: float = 0.7,
                vgain: float = 0.4, rng: Optional[random.Random] = None) -> np.ndarray:
    """Random HSV jitter via channel LUTs. Returns the augmented image (BGR uint8)."""
    if cv2 is None or not (hgain or sgain or vgain):
        return img
    rng = rng or random
    r = np.array([rng.uniform(-1, 1) for _ in range(3)]) * [hgain, sgain, vgain] + 1
    hue, sat, val = cv2.split(cv2.cvtColor(img, cv2.COLOR_BGR2HSV))

    x = np.arange(0, 256, dtype=r.dtype)
    lut_h = ((x * r[0]) % 180).astype(img.dtype)
    lut_s = np.clip(x * r[1], 0, 255).astype(img.dtype)
    lut_v = np.clip(x * r[2], 0, 255).astype(img.dtype)

    im_hsv = cv2.merge((cv2.LUT(hue, lut_h), cv2.LUT(sat, lut_s), cv2.LUT(val, lut_v)))
    return cv2.cvtColor(im_hsv, cv2.COLOR_HSV2BGR)


def box_candidates(box1: np.ndarray, box2: np.ndarray, wh_thr: float = 2.0,
                   ar_thr: float = 20.0, area_thr: float = 0.1,
                   eps: float = 1e-16) -> np.ndarray:
    """Filter warped boxes: min size, aspect ratio, area retention
    (reference augmentation.py:314-337)."""
    w1, h1 = box1[2] - box1[0], box1[3] - box1[1]
    w2, h2 = box2[2] - box2[0], box2[3] - box2[1]
    ar = np.maximum(w2 / (h2 + eps), h2 / (w2 + eps))
    return (
        (w2 > wh_thr)
        & (h2 > wh_thr)
        & (w2 * h2 / (w1 * h1 + eps) > area_thr)
        & (ar < ar_thr)
    )


def build_affine_matrix(
    width: int,
    height: int,
    degrees: float = 0.0,
    translate: float = 0.1,
    scale: float = 0.5,
    shear: float = 0.0,
    perspective: float = 0.0,
    border: Tuple[int, int] = (0, 0),
    rng: Optional[random.Random] = None,
) -> Tuple[np.ndarray, float]:
    """Compose the T·S·R·P·C warp matrix (reference order, augmentation.py:102-140).
    Returns (3x3 matrix, scale factor)."""
    rng = rng or random

    C = np.eye(3)
    C[0, 2] = -width / 2
    C[1, 2] = -height / 2

    P = np.eye(3)
    P[2, 0] = rng.uniform(-perspective, perspective)
    P[2, 1] = rng.uniform(-perspective, perspective)

    R = np.eye(3)
    a = rng.uniform(-degrees, degrees)
    s = rng.uniform(1 - scale, 1 + scale)
    R[:2] = cv2.getRotationMatrix2D(angle=a, center=(0, 0), scale=s) if cv2 is not None \
        else np.array([[s * math.cos(math.radians(a)), -s * math.sin(math.radians(a)), 0],
                       [s * math.sin(math.radians(a)), s * math.cos(math.radians(a)), 0]])

    S = np.eye(3)
    S[0, 1] = math.tan(rng.uniform(-shear, shear) * math.pi / 180)
    S[1, 0] = math.tan(rng.uniform(-shear, shear) * math.pi / 180)

    T = np.eye(3)
    out_w = width + border[1] * 2
    out_h = height + border[0] * 2
    T[0, 2] = rng.uniform(0.5 - translate, 0.5 + translate) * out_w
    T[1, 2] = rng.uniform(0.5 - translate, 0.5 + translate) * out_h

    M = T @ S @ R @ P @ C
    return M, s


def random_perspective(
    img: np.ndarray,
    targets: Optional[np.ndarray] = None,
    degrees: float = 0.0,
    translate: float = 0.1,
    scale: float = 0.5,
    shear: float = 0.0,
    perspective: float = 0.0,
    border: Tuple[int, int] = (0, 0),
    rng: Optional[random.Random] = None,
) -> Tuple[np.ndarray, np.ndarray]:
    """Affine/perspective warp of image + xyxy targets [cls, x1, y1, x2, y2]."""
    height = img.shape[0] + border[0] * 2
    width = img.shape[1] + border[1] * 2
    targets = np.zeros((0, 5), np.float32) if targets is None else targets

    M, s = build_affine_matrix(
        img.shape[1], img.shape[0], degrees, translate, scale, shear, perspective,
        border, rng,
    )
    identity = np.allclose(M, np.eye(3)) and border == (0, 0)
    if not identity and cv2 is not None:
        if perspective:
            img = cv2.warpPerspective(img, M, dsize=(width, height),
                                      borderValue=(114, 114, 114))
        else:
            img = cv2.warpAffine(img, M[:2], dsize=(width, height),
                                 borderValue=(114, 114, 114))

    n = len(targets)
    if n:
        pts = np.ones((n * 4, 3))
        pts[:, :2] = targets[:, [1, 2, 3, 4, 1, 4, 3, 2]].reshape(n * 4, 2)
        pts = pts @ M.T
        pts = (pts[:, :2] / pts[:, 2:3] if perspective else pts[:, :2]).reshape(n, 8)

        x = pts[:, [0, 2, 4, 6]]
        y = pts[:, [1, 3, 5, 7]]
        new = np.stack([x.min(1), y.min(1), x.max(1), y.max(1)], axis=1)
        new[:, [0, 2]] = new[:, [0, 2]].clip(0, width)
        new[:, [1, 3]] = new[:, [1, 3]].clip(0, height)

        keep = box_candidates(
            box1=targets[:, 1:5].T * s, box2=new.T, area_thr=0.10
        )
        targets = targets[keep]
        targets[:, 1:5] = new[keep]
    return img, targets


def flip_lr(img: np.ndarray, labels_xywhn: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Horizontal flip; labels are [cls, x, y, w, h] normalized."""
    img = np.ascontiguousarray(img[:, ::-1])
    if len(labels_xywhn):
        labels_xywhn = labels_xywhn.copy()
        labels_xywhn[:, 1] = 1.0 - labels_xywhn[:, 1]
    return img, labels_xywhn


def flip_ud(img: np.ndarray, labels_xywhn: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    img = np.ascontiguousarray(img[::-1])
    if len(labels_xywhn):
        labels_xywhn = labels_xywhn.copy()
        labels_xywhn[:, 2] = 1.0 - labels_xywhn[:, 2]
    return img, labels_xywhn


def mixup(im1: np.ndarray, labels1: np.ndarray, im2: np.ndarray,
          labels2: np.ndarray, rng=None) -> Tuple[np.ndarray, np.ndarray]:
    """Beta(8, 8) image blend, labels concatenated (reference :273-290)."""
    r = (rng or np.random).beta(8.0, 8.0)
    im = (im1 * r + im2 * (1 - r)).astype(im1.dtype)
    return im, np.concatenate([labels1, labels2], 0)


def cutout(img: np.ndarray, labels: np.ndarray, p: float = 0.5,
           rng: Optional[random.Random] = None) -> Tuple[np.ndarray, np.ndarray]:
    """Random occlusion squares with random color fill (YOLOv5 convention)."""
    rng = rng or random
    if rng.random() >= p:
        return img, labels
    h, w = img.shape[:2]
    scales = [0.5] * 1 + [0.25] * 2 + [0.125] * 4 + [0.0625] * 8 + [0.03125] * 16
    img = img.copy()
    for s in scales:
        mask_h = rng.randint(1, max(int(h * s), 1))
        mask_w = rng.randint(1, max(int(w * s), 1))
        xmin = max(0, rng.randint(0, w) - mask_w // 2)
        ymin = max(0, rng.randint(0, h) - mask_h // 2)
        xmax = min(w, xmin + mask_w)
        ymax = min(h, ymin + mask_h)
        img[ymin:ymax, xmin:xmax] = [rng.randint(64, 191) for _ in range(3)]
        if len(labels):
            box = np.array([[xmin, ymin, xmax, ymax]], np.float32)
            l_xyxy = labels[:, 1:5].copy()
            l_xyxy = np.stack(
                [
                    w * (labels[:, 1] - labels[:, 3] / 2),
                    h * (labels[:, 2] - labels[:, 4] / 2),
                    w * (labels[:, 1] + labels[:, 3] / 2),
                    h * (labels[:, 2] + labels[:, 4] / 2),
                ],
                1,
            )
            inter_w = np.minimum(l_xyxy[:, 2], box[0, 2]) - np.maximum(l_xyxy[:, 0], box[0, 0])
            inter_h = np.minimum(l_xyxy[:, 3], box[0, 3]) - np.maximum(l_xyxy[:, 1], box[0, 1])
            inter = np.clip(inter_w, 0, None) * np.clip(inter_h, 0, None)
            area = (l_xyxy[:, 2] - l_xyxy[:, 0]) * (l_xyxy[:, 3] - l_xyxy[:, 1]) + 1e-9
            labels = labels[inter / area < 0.6]
    return img, labels


class AerialAugmentor:
    """Stateful augmentation suite facade (reference AerialAugmentation,
    augmentation.py:15-42; aliased because dataset.py:17 imports `AerialAugmentor`)."""

    def __init__(self, hyp: Optional[Dict[str, float]] = None, seed: Optional[int] = None):
        self.hyp = dict(DEFAULT_HYP)
        if hyp:
            self.hyp.update(hyp)
        self.rng = random.Random(seed)
        self.np_rng = np.random.default_rng(seed)

    def __call__(self, img: np.ndarray, labels: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
        """Full single-image pipeline: affine -> HSV -> flips.
        labels: [cls, x, y, w, h] normalized; returns same format."""
        h0, w0 = img.shape[:2]
        # to xyxy pixels for the warp
        if len(labels):
            xyxy = np.stack(
                [
                    labels[:, 0],
                    w0 * (labels[:, 1] - labels[:, 3] / 2),
                    h0 * (labels[:, 2] - labels[:, 4] / 2),
                    w0 * (labels[:, 1] + labels[:, 3] / 2),
                    h0 * (labels[:, 2] + labels[:, 4] / 2),
                ],
                1,
            ).astype(np.float32)
        else:
            xyxy = np.zeros((0, 5), np.float32)

        img, xyxy = random_perspective(
            img, xyxy,
            degrees=self.hyp["degrees"], translate=self.hyp["translate"],
            scale=self.hyp["scale"], shear=self.hyp["shear"],
            perspective=self.hyp["perspective"], rng=self.rng,
        )
        img = augment_hsv(img, self.hyp["hsv_h"], self.hyp["hsv_s"],
                          self.hyp["hsv_v"], rng=self.rng)

        h, w = img.shape[:2]
        if len(xyxy):
            labels = np.stack(
                [
                    xyxy[:, 0],
                    (xyxy[:, 1] + xyxy[:, 3]) / 2 / w,
                    (xyxy[:, 2] + xyxy[:, 4]) / 2 / h,
                    (xyxy[:, 3] - xyxy[:, 1]) / w,
                    (xyxy[:, 4] - xyxy[:, 2]) / h,
                ],
                1,
            ).astype(np.float32)
        else:
            labels = np.zeros((0, 5), np.float32)

        if self.rng.random() < self.hyp["flipud"]:
            img, labels = flip_ud(img, labels)
        if self.rng.random() < self.hyp["fliplr"]:
            img, labels = flip_lr(img, labels)
        return img, labels


# Reference class name kept as an alias (augmentation.py:15)
AerialAugmentation = AerialAugmentor


class AlbumentationsWrapper:
    """Optional albumentations bridge (reference augmentation.py:340-439):
    blur / median-blur / to-gray / CLAHE / brightness-contrast / gamma / compression
    with YOLO-format bbox params. No-op when albumentations is not installed."""

    def __init__(self, p: float = 1.0):
        self.transform = None
        try:
            import albumentations as A

            self.transform = A.Compose(
                [
                    A.Blur(p=0.01),
                    A.MedianBlur(p=0.01),
                    A.ToGray(p=0.01),
                    A.CLAHE(p=0.01),
                    A.RandomBrightnessContrast(p=0.0),
                    A.RandomGamma(p=0.0),
                    A.ImageCompression(quality_lower=75, p=0.0),
                ],
                bbox_params=A.BboxParams(format="yolo", label_fields=["class_labels"]),
                p=p,
            )
        except ImportError:
            pass

    def __call__(self, img: np.ndarray, labels: np.ndarray):
        """labels: (n, 5) [cls, x, y, w, h] normalized. Returns (img, labels)."""
        if self.transform is None or not len(labels):
            return img, labels
        out = self.transform(
            image=img, bboxes=labels[:, 1:].tolist(), class_labels=labels[:, 0].tolist()
        )
        img = out["image"]
        if out["bboxes"]:
            labels = np.array(
                [[c, *b] for c, b in zip(out["class_labels"], out["bboxes"])],
                np.float32,
            )
        else:
            labels = np.zeros((0, 5), np.float32)
        return img, labels
