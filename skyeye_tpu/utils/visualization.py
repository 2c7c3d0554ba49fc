"""Visualization: box annotation, batch mosaics, label stats, training curves.

Capability parity (reference /root/reference/skyeye/utils/visualization.py):
  Annotator / ImageAnnotator <- dual PIL/OpenCV box+label renderer (:43-147); the
                                reference detect CLI imports `Annotator, colors`
                                which never existed (detect.py:28, SURVEY.md §8#3)
  colors                     <- deterministic per-class palette (missing symbol)
  plot_one_box               <- (:150-177)
  plot_images                <- batch mosaic grid with boxes (:180-261)
  plot_labels                <- dataset label statistics plots (:264-327)
  plot_results               <- training-curve plots from results.csv (:330-398)
  plot_pr_curve/plot_mc_curve<- PR/F1 curve plots (:401-438)
  save_one_box               <- crop saving (used detect.py:189; missing symbol)
"""
from __future__ import annotations

from pathlib import Path
from typing import Dict, Optional, Sequence

import numpy as np

try:
    import cv2
except Exception:  # pragma: no cover
    cv2 = None


class Colors:
    """Deterministic class color palette (hex ring)."""

    def __init__(self):
        hexs = (
            "FF3838", "FF9D97", "FF701F", "FFB21D", "CFD231", "48F90A", "92CC17",
            "3DDB86", "1A9334", "00D4BB", "2C99A8", "00C2FF", "344593", "6473FF",
            "0018EC", "8438FF", "520085", "CB38FF", "FF95C8", "FF37C7",
        )
        self.palette = [self._hex2rgb(f"#{c}") for c in hexs]
        self.n = len(self.palette)

    @staticmethod
    def _hex2rgb(h):
        return tuple(int(h[1 + i : 1 + i + 2], 16) for i in (0, 2, 4))

    def __call__(self, i: int, bgr: bool = False):
        c = self.palette[int(i) % self.n]
        return (c[2], c[1], c[0]) if bgr else c


colors = Colors()


class Annotator:
    """Box/label renderer over a numpy BGR image (cv2 path) or PIL image."""

    def __init__(self, im: np.ndarray, line_width: Optional[int] = None,
                 font_size: Optional[int] = None, pil: bool = False):
        self.pil = pil or cv2 is None
        if self.pil:
            from PIL import Image, ImageDraw, ImageFont

            self.im = im if isinstance(im, Image.Image) else Image.fromarray(im[..., ::-1])
            self.draw = ImageDraw.Draw(self.im)
            try:
                self.font = ImageFont.truetype("DejaVuSans.ttf", font_size or 12)
            except Exception:
                self.font = ImageFont.load_default()
        else:
            self.im = np.ascontiguousarray(im)
        self.lw = line_width or max(round(sum(np.asarray(im).shape[:2]) / 2 * 0.003), 2)

    def box_label(self, box, label: str = "", color=(128, 128, 128),
                  txt_color=(255, 255, 255)):
        p1, p2 = (int(box[0]), int(box[1])), (int(box[2]), int(box[3]))
        if self.pil:
            self.draw.rectangle([p1, p2], outline=color, width=self.lw)
            if label:
                bbox = self.draw.textbbox(p1, label, font=self.font)
                self.draw.rectangle(bbox, fill=color)
                self.draw.text(p1, label, fill=txt_color, font=self.font)
        else:
            cv2.rectangle(self.im, p1, p2, color, self.lw, cv2.LINE_AA)
            if label:
                tf = max(self.lw - 1, 1)
                w, h = cv2.getTextSize(label, 0, self.lw / 3, tf)[0]
                outside = p1[1] - h - 3 >= 0
                p2t = (p1[0] + w, p1[1] - h - 3 if outside else p1[1] + h + 3)
                cv2.rectangle(self.im, p1, p2t, color, -1, cv2.LINE_AA)
                cv2.putText(
                    self.im, label,
                    (p1[0], p1[1] - 2 if outside else p1[1] + h + 2),
                    0, self.lw / 3, txt_color, tf, cv2.LINE_AA,
                )

    def result(self) -> np.ndarray:
        if self.pil:
            return np.asarray(self.im)[..., ::-1].copy()
        return self.im


# Reference-facing alias (visualization.py:43 defines `ImageAnnotator`)
ImageAnnotator = Annotator


def plot_one_box(box, im: np.ndarray, color=(128, 128, 128), label: Optional[str] = None,
                 line_thickness: int = 3) -> np.ndarray:
    a = Annotator(im, line_width=line_thickness)
    a.box_label(box, label or "", color)
    return a.result()


def save_one_box(xyxy, im: np.ndarray, file="crop.jpg", gain: float = 1.02,
                 pad: int = 10, square: bool = False, BGR: bool = True,
                 save: bool = True) -> np.ndarray:
    """Save/return an enlarged crop around a box (used by detect --save-crop)."""
    b = np.asarray(xyxy, np.float32).reshape(4)
    cx, cy = (b[0] + b[2]) / 2, (b[1] + b[3]) / 2
    w, h = (b[2] - b[0]) * gain + pad, (b[3] - b[1]) * gain + pad
    if square:
        w = h = max(w, h)
    x1, y1 = int(max(cx - w / 2, 0)), int(max(cy - h / 2, 0))
    x2, y2 = int(min(cx + w / 2, im.shape[1])), int(min(cy + h / 2, im.shape[0]))
    crop = im[y1:y2, x1:x2]
    if save and cv2 is not None:
        file = Path(file)
        file.parent.mkdir(parents=True, exist_ok=True)
        cv2.imwrite(str(file), crop if BGR else crop[..., ::-1])
    return crop


def plot_images(images: np.ndarray, targets: np.ndarray, paths=None,
                fname="images.jpg", names: Optional[Sequence[str]] = None,
                max_size: int = 1920, max_subplots: int = 16) -> np.ndarray:
    """Batch mosaic with boxes. images: (B, H, W, 3) RGB in [0, 1] or [0, 255];
    targets: (n, 7) [img_idx, cls, x, y, w, h(, conf)] normalized xywh."""
    images = np.asarray(images)
    if images.max() <= 1.01:
        images = images * 255
    bs, h, w, _ = images.shape
    bs = min(bs, max_subplots)
    ns = int(np.ceil(bs**0.5))

    mosaic = np.full((ns * h, ns * w, 3), 255, np.uint8)
    for i in range(bs):
        x, y = (i % ns) * w, (i // ns) * h
        mosaic[y : y + h, x : x + w] = images[i].astype(np.uint8)

    scale = max_size / ns / max(h, w)
    if scale < 1 and cv2 is not None:
        mosaic = cv2.resize(mosaic, (int(ns * w * scale), int(ns * h * scale)))
    else:
        scale = 1.0

    ann = Annotator(mosaic[..., ::-1].copy(), line_width=2)  # expects BGR
    for i in range(bs):
        ox, oy = (i % ns) * w * scale, (i // ns) * h * scale
        if len(targets):
            ti = targets[targets[:, 0] == i]
            for row in ti:
                cls = int(row[1])
                bx, by, bw_, bh_ = row[2:6]
                x1 = (bx - bw_ / 2) * w * scale + ox
                y1 = (by - bh_ / 2) * h * scale + oy
                x2 = (bx + bw_ / 2) * w * scale + ox
                y2 = (by + bh_ / 2) * h * scale + oy
                conf = row[6] if row.shape[0] > 6 else None
                label = (names[cls] if names and cls < len(names) else str(cls)) + (
                    f" {conf:.2f}" if conf is not None else ""
                )
                ann.box_label((x1, y1, x2, y2), label, colors(cls, True))
    out = ann.result()
    if fname and cv2 is not None:
        cv2.imwrite(str(fname), out[..., ::-1])
    return out


def plot_labels(labels: np.ndarray, names: Sequence[str] = (), save_dir: Path = Path(".")):
    """Dataset label statistics: class histogram + box center/size distributions."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    c = labels[:, 0].astype(int)
    boxes = labels[:, 1:5]
    nc = int(c.max() + 1) if len(c) else 1

    fig, axes = plt.subplots(2, 2, figsize=(8, 8), tight_layout=True)
    axes[0, 0].hist(c, bins=np.arange(nc + 1) - 0.5, rwidth=0.8)
    axes[0, 0].set_xlabel("class")
    axes[0, 1].scatter(boxes[:, 0], boxes[:, 1], c=c, cmap="tab20", s=3, alpha=0.5)
    axes[0, 1].set_xlabel("x")
    axes[0, 1].set_ylabel("y")
    axes[1, 0].scatter(boxes[:, 2], boxes[:, 3], c=c, cmap="tab20", s=3, alpha=0.5)
    axes[1, 0].set_xlabel("width")
    axes[1, 0].set_ylabel("height")
    axes[1, 1].hist2d(boxes[:, 0], boxes[:, 1], bins=50, cmap="Blues")
    axes[1, 1].set_xlabel("x")
    axes[1, 1].set_ylabel("y")
    fig.savefig(Path(save_dir) / "labels.jpg", dpi=200)
    plt.close(fig)


RESULTS_COLUMNS = [
    "epoch", "train/box_loss", "train/obj_loss", "train/cls_loss",
    "metrics/precision", "metrics/recall", "metrics/mAP_0.5", "metrics/mAP_0.5:0.95",
    "val/box_loss", "val/obj_loss", "val/cls_loss", "lr",
]


def plot_results(file="results.csv", save_dir: Optional[Path] = None):
    """Training curves from results.csv (schema: RESULTS_COLUMNS)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    import pandas as pd

    file = Path(file)
    save_dir = Path(save_dir or file.parent)
    df = pd.read_csv(file)
    df.columns = [c.strip() for c in df.columns]
    cols = [c for c in df.columns if c != "epoch"]
    n = len(cols)
    rows = int(np.ceil(n / 5))
    fig, axes = plt.subplots(rows, 5, figsize=(18, 3 * rows), tight_layout=True)
    axes = np.atleast_2d(axes)
    for i, c in enumerate(cols):
        ax = axes[i // 5, i % 5]
        ax.plot(df["epoch"], df[c], marker=".", linewidth=1, markersize=3)
        ax.set_title(c, fontsize=9)
    fig.savefig(save_dir / "results.png", dpi=200)
    plt.close(fig)


def plot_pr_curve(px, py, ry, ap, save_path=Path("PR_curve.png"),
                  names: Dict[int, str] = {}):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(1, 1, figsize=(9, 6), tight_layout=True)
    for i in range(py.shape[0]):
        label = f"{names.get(i, i)} {ap[i, 0]:.3f}" if len(names) < 21 else None
        ax.plot(ry[i], py[i], linewidth=1, label=label)
    ax.plot([], [], " ", label=f"all classes {ap[:, 0].mean():.3f} mAP@0.5")
    ax.set_xlabel("Recall")
    ax.set_ylabel("Precision")
    ax.set_xlim(0, 1)
    ax.set_ylim(0, 1)
    ax.legend(loc="lower left", fontsize=7)
    fig.savefig(save_path, dpi=250)
    plt.close(fig)


def plot_mc_curve(px, py, save_path=Path("mc_curve.png"), names: Dict[int, str] = {},
                  xlabel: str = "Confidence", ylabel: str = "Metric"):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(1, 1, figsize=(9, 6), tight_layout=True)
    for i in range(py.shape[0]):
        ax.plot(px, py[i], linewidth=1,
                label=str(names.get(i, i)) if len(names) < 21 else None)
    y = py.mean(0)
    ax.plot(px, y, linewidth=2, color="blue",
            label=f"all classes {y.max():.2f} at {px[y.argmax()]:.3f}")
    ax.set_xlabel(xlabel)
    ax.set_ylabel(ylabel)
    ax.set_xlim(0, 1)
    ax.set_ylim(0, 1)
    ax.legend(loc="lower left", fontsize=7)
    fig.savefig(save_path, dpi=250)
    plt.close(fig)


def plot_val_study(file="study.txt", save_dir: Optional[Path] = None):
    """Speed/accuracy trade-off plot from a study file of rows
    [P, R, mAP@.5, mAP@.5:.95, pre_ms, inf_ms] per image size
    (reference import, validate.py:27)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    file = Path(file)
    save_dir = Path(save_dir or file.parent)
    data = np.loadtxt(file, ndmin=2).T
    fig, ax = plt.subplots(1, 1, figsize=(8, 5), tight_layout=True)
    ax.plot(data[5], data[3] * 100, ".-", linewidth=2, markersize=8)
    ax.set_xlabel("inference latency (ms/img)")
    ax.set_ylabel("mAP@0.5:0.95 (%)")
    ax.grid(alpha=0.2)
    out = save_dir / "study.png"
    fig.savefig(out, dpi=250)
    plt.close(fig)
    return out
