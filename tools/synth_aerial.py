"""Synthetic VisDrone-style aerial detection dataset generator.

No real drone imagery is obtainable in this environment (zero egress), so the
mAP-parity evidence (VERDICT.md #3) runs on a rich synthetic stand-in that
mimics the statistics that make aerial detection hard (SURVEY.md §0): many
small, dense, overlapping top-down objects on cluttered ground textures.

Characteristics per image:
  * textured background: low-frequency "terrain" noise + road bands + block
    structures (buildings) so the negatives are not trivially uniform
  * 8 object classes with distinct shape/color archetypes (car, van, truck,
    bus, person, bicycle, awning, block) drawn top-down with jittered colors,
    rotation, occlusion and partial overlap
  * object sizes 6-60 px on a 640-1024 px canvas — dominated by small objects
  * mixed aspect-ratio canvases for rect-eval coverage

Usage: python tools/synth_aerial.py --root /tmp/synth_aerial --n-train 128 --n-val 64
"""
from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np

try:
    import cv2
except ImportError:  # pragma: no cover
    cv2 = None

CLASSES = ["car", "van", "truck", "bus", "person", "bicycle", "awning", "block"]

# (w_range, h_range, base BGR color) per class — top-down archetypes
_SPECS = [
    ((10, 22), (18, 38), (60, 60, 200)),    # car: small rect, reddish
    ((14, 26), (26, 46), (80, 160, 200)),   # van: boxier, tan
    ((16, 30), (40, 80), (60, 180, 80)),    # truck: long, green
    ((18, 32), (50, 100), (40, 200, 220)),  # bus: longest, yellow
    ((6, 12), (6, 12), (200, 80, 80)),      # person: tiny dot, blue
    ((5, 11), (10, 20), (220, 60, 160)),    # bicycle: thin sliver, purple
    ((20, 44), (20, 44), (60, 200, 250)),   # awning: orange square
    ((24, 56), (24, 56), (200, 220, 90)),   # block: cyan square
]


def _terrain(h: int, w: int, rng: np.random.Generator) -> np.ndarray:
    """Cluttered ground: multi-octave value noise + roads + building blocks."""
    img = np.zeros((h, w, 3), np.float32)
    base = rng.uniform(60, 110)
    for octave in (8, 32):
        small = rng.uniform(-25, 25, (h // octave + 2, w // octave + 2, 3))
        up = np.kron(small, np.ones((octave, octave, 1)))[:h, :w]
        img += up
    img += base + rng.uniform(-10, 25, 3)  # per-image tint
    # road bands
    for _ in range(rng.integers(1, 4)):
        if rng.random() < 0.5:
            y = int(rng.integers(0, h - 30))
            img[y : y + int(rng.integers(18, 40)), :] = rng.uniform(45, 70)
        else:
            x = int(rng.integers(0, w - 30))
            img[:, x : x + int(rng.integers(18, 40))] = rng.uniform(45, 70)
    # building blocks (distractors — NOT labeled; kept visually distinct from
    # every labeled class: large, desaturated, darker-bordered)
    for _ in range(rng.integers(2, 7)):
        bw, bh = int(rng.integers(70, 160)), int(rng.integers(70, 160))
        x, y = int(rng.integers(0, max(w - bw, 1))), int(rng.integers(0, max(h - bh, 1)))
        shade = rng.uniform(95, 125)
        img[y : y + bh, x : x + bw] = shade + rng.uniform(-6, 6, 3)
        img[y : y + 4, x : x + bw] = shade * 0.6
        img[y : y + bh, x : x + 4] = shade * 0.6
    return np.clip(img, 0, 255).astype(np.uint8)


def _draw_object(img, cls: int, cx: float, cy: float, rng) -> tuple:
    """Draw one rotated object; returns its axis-aligned (x1, y1, x2, y2)."""
    (wlo, whi), (hlo, hhi), color = _SPECS[cls]
    ow = rng.uniform(wlo, whi)
    oh = rng.uniform(hlo, hhi)
    ang = rng.uniform(0, 180)
    jitter = np.clip(np.array(color) + rng.uniform(-30, 30, 3), 0, 255)
    rect = ((float(cx), float(cy)), (float(ow), float(oh)), float(ang))
    box = cv2.boxPoints(rect)
    cv2.fillPoly(img, [box.astype(np.int32)], jitter.tolist())
    if cls < 4:  # vehicles get a windshield stripe for texture
        inner = ((float(cx), float(cy)), (float(ow * 0.6), float(oh * 0.25)), float(ang))
        cv2.fillPoly(img, [cv2.boxPoints(inner).astype(np.int32)],
                     np.clip(jitter * 0.6, 0, 255).tolist())
    x1, y1 = box.min(0)
    x2, y2 = box.max(0)
    return x1, y1, x2, y2


def make_split(root: Path, split: str, n_images: int, seed: int,
               square: bool = False, img_size: int = 768):
    if cv2 is None:
        raise RuntimeError("cv2 required for dataset generation")
    rng = np.random.default_rng(seed)
    img_dir = root / "images" / split
    lbl_dir = root / "labels" / split
    img_dir.mkdir(parents=True, exist_ok=True)
    lbl_dir.mkdir(parents=True, exist_ok=True)
    aspects = [1.0] if square else [1.0, 4 / 3, 3 / 4, 16 / 9]
    for i in range(n_images):
        ar = aspects[i % len(aspects)]
        w = int(img_size * min(ar, 1.25))
        h = int(w / ar)
        img = _terrain(h, w, rng)
        n_obj = int(rng.integers(8, 36))
        rows = []
        for _ in range(n_obj):
            cls = int(rng.integers(0, len(CLASSES)))
            cx = rng.uniform(20, w - 20)
            cy = rng.uniform(20, h - 20)
            x1, y1, x2, y2 = _draw_object(img, cls, cx, cy, rng)
            x1, y1 = max(x1, 0), max(y1, 0)
            x2, y2 = min(x2, w), min(y2, h)
            if x2 - x1 < 3 or y2 - y1 < 3:
                continue
            rows.append(f"{cls} {(x1 + x2) / 2 / w:.6f} {(y1 + y2) / 2 / h:.6f} "
                        f"{(x2 - x1) / w:.6f} {(y2 - y1) / h:.6f}")
        cv2.imwrite(str(img_dir / f"{split}{i:05d}.jpg"), img,
                    [cv2.IMWRITE_JPEG_QUALITY, 92])
        (lbl_dir / f"{split}{i:05d}.txt").write_text("\n".join(rows) + "\n")


def make_dataset(root: Path, n_train: int = 128, n_val: int = 64, seed: int = 0,
                 square: bool = False, img_size: int = 768) -> Path:
    """Generate train+val splits + data yaml; returns the yaml path."""
    root = Path(root)
    make_split(root, "train", n_train, seed, square=square, img_size=img_size)
    make_split(root, "val", n_val, seed + 10_000, square=square, img_size=img_size)
    yaml_path = root / "data.yaml"
    import yaml as _yaml

    yaml_path.write_text(_yaml.safe_dump({
        "path": str(root),
        "train": "images/train",
        "val": "images/val",
        "nc": len(CLASSES),
        "names": CLASSES,
    }))
    return yaml_path


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--root", type=Path, required=True)
    p.add_argument("--n-train", type=int, default=128)
    p.add_argument("--n-val", type=int, default=64)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--img-size", type=int, default=768)
    p.add_argument("--square", action="store_true")
    args = p.parse_args()
    yp = make_dataset(args.root, args.n_train, args.n_val, args.seed,
                      square=args.square, img_size=args.img_size)
    print(yp)


if __name__ == "__main__":
    main()
