"""YOLO-format dataset with label caching, mosaic, rect batching, and a
prefetching fixed-shape batch loader (no torch DataLoader).

Capability parity (reference /root/reference/skyeye/core/data/dataset.py and
loaders.py — two near-duplicate implementations, unified here; SURVEY.md D4/D5):
  * dir-glob / list-file image discovery (dataset.py:148-163)
  * images/ -> labels/ path mapping `img2label_paths` (loaders.py:349-357)
  * parallel label verification with corrupt-file tolerance (dataset.py:41-102)
  * label cache (.cache npz) keyed by a hash of sizes+paths (dataset.py:169-226)
  * rect batching by aspect ratio (dataset.py:233-257)
  * RAM caching (dataset.py:259-265)
  * mosaic + mixup in __getitem__ (loaders.py:211-222)
  * collate -> batch with per-image target padding (dataset.py:348-365)

TPU-native redesign: batches are FIXED-SHAPE dicts
  {images: (B, H, W, 3) uint8 NHWC, targets: (B, M, 6), mask: (B, M) bool}
so the jitted train step never recompiles. Targets are padded per image to
`max_labels`. A background thread pool decodes+augments and a prefetch queue
double-buffers host work against device steps (replaces torch DataLoader workers +
InfiniteDataLoader, loaders.py:83-124).
"""
from __future__ import annotations

import hashlib
import math
import os
import queue
import random
import threading
from concurrent.futures import ThreadPoolExecutor
from pathlib import Path
from typing import Dict, Iterator, List, Optional, Sequence, Tuple

import numpy as np

try:
    import cv2
except Exception:  # pragma: no cover
    cv2 = None

from ..config import DEFAULT_HYP
from ..ops.letterbox import letterbox
from ..utils.general import LOGGER
from .augment import augment_hsv, flip_lr, flip_ud, mixup, random_perspective

IMG_FORMATS = ("bmp", "dng", "jpeg", "jpg", "mpo", "png", "tif", "tiff", "webp")
VID_FORMATS = ("asf", "avi", "gif", "m4v", "mkv", "mov", "mp4", "mpeg", "mpg", "ts", "wmv")
CACHE_VERSION = "skyeye_tpu-0.1"


def img2label_paths(img_paths: Sequence[str]) -> List[str]:
    """images/ -> labels/, .ext -> .txt (reference loaders.py:349-357)."""
    sa, sb = f"{os.sep}images{os.sep}", f"{os.sep}labels{os.sep}"
    return [sb.join(p.rsplit(sa, 1)).rsplit(".", 1)[0] + ".txt" for p in img_paths]


def get_hash(paths: Sequence[str]) -> str:
    """md5 of total size + joined paths (reference dataset.py:24-38)."""
    size = sum(os.path.getsize(p) for p in paths if os.path.exists(p))
    h = hashlib.md5(str(size).encode())
    h.update("".join(paths).encode())
    return h.hexdigest()


def find_images(path) -> List[str]:
    """Discover images from a dir, glob, or list file (reference dataset.py:148-163)."""
    files: List[str] = []
    for p in path if isinstance(path, (list, tuple)) else [path]:
        p = Path(p)
        if p.is_dir():
            files += [str(f) for f in sorted(p.rglob("*.*"))]
        elif p.is_file():
            if p.suffix == ".txt":
                root = p.parent
                for line in p.read_text().splitlines():
                    line = line.strip()
                    if not line:
                        continue
                    files.append(str((root / line).resolve()) if line.startswith("./") else line)
            else:
                files.append(str(p))
        else:
            import glob as _glob

            files += sorted(_glob.glob(str(p), recursive=True))
    return sorted(f for f in files if f.rsplit(".", 1)[-1].lower() in IMG_FORMATS)


def verify_image_label(args) -> Tuple[Optional[str], Optional[np.ndarray], Optional[Tuple[int, int]], int, int, int, str]:
    """Verify one (image, label) pair. Returns
    (img_file, labels (n,5), (w,h), n_found, n_missing, n_corrupt, msg)."""
    img_file, label_file = args
    try:
        from PIL import Image

        with Image.open(img_file) as im:
            im.verify()
            shape = im.size  # (w, h)
        if shape[0] < 10 or shape[1] < 10:
            raise ValueError(f"image too small {shape}")

        if os.path.isfile(label_file):
            with open(label_file) as f:
                rows = [x.split() for x in f.read().strip().splitlines() if len(x)]
            labels = np.array(rows, dtype=np.float32) if rows else np.zeros((0, 5), np.float32)
            if len(labels):
                # allow segment polygons: class + >=8 coords -> bbox of the polygon
                if labels.shape[1] > 5:
                    boxes = []
                    for r in labels:
                        xs, ys = r[1::2], r[2::2]
                        boxes.append([r[0], (xs.min() + xs.max()) / 2, (ys.min() + ys.max()) / 2,
                                      xs.max() - xs.min(), ys.max() - ys.min()])
                    labels = np.array(boxes, np.float32)
                if labels.shape[1] != 5:
                    raise ValueError(f"labels require 5 columns, got {labels.shape[1]}")
                if (labels < 0).any() or (labels[:, 1:] > 1).any():
                    raise ValueError("non-normalized or negative label coordinates")
                labels = np.unique(labels, axis=0)
            return img_file, labels, shape, 1 if len(labels) else 0, 0 if len(labels) else 1, 0, ""
        return img_file, np.zeros((0, 5), np.float32), shape, 0, 1, 0, ""
    except Exception as e:  # corrupt image/label tolerated (dataset.py:41-102)
        return None, None, None, 0, 0, 1, f"ignoring corrupt image/label {img_file}: {e}"


class AerialDataset:
    """Map-style YOLO dataset with caching, mosaic/mixup/affine/HSV augmentation.

    __getitem__ returns (img (H, W, 3) uint8 BGR letterboxed, labels (n, 5)
    [cls, x, y, w, h] normalized to the output canvas).
    """

    def __init__(
        self,
        path,
        img_size: int = 640,
        batch_size: int = 16,
        augment: bool = False,
        hyp: Optional[Dict[str, float]] = None,
        rect: bool = False,
        stride: int = 32,
        pad: float = 0.0,
        cache_images: bool = False,
        max_labels: int = 300,
        seed: int = 0,
        shape_buckets: Optional[int] = None,
    ):
        self.img_size = img_size
        self.augment = augment
        self.hyp = dict(DEFAULT_HYP)
        if hyp:
            self.hyp.update(hyp)
        self.rect = rect and not augment
        self.stride = stride
        self.pad = pad
        self.shape_buckets = shape_buckets
        self.max_labels = max_labels
        self.mosaic = augment and self.hyp.get("mosaic", 0) > 0
        self.mosaic_border = (-img_size // 2, -img_size // 2)
        self.rng = random.Random(seed)
        self.np_rng = np.random.default_rng(seed)

        self.img_files = find_images(path)
        if not self.img_files:
            raise FileNotFoundError(f"no images found in {path}")
        self.label_files = img2label_paths(self.img_files)

        cache = self._load_or_build_cache()
        self.labels = [cache[f][0] for f in self.img_files]
        self.shapes = np.array([cache[f][1] for f in self.img_files], np.float64)  # (w, h)
        n = len(self.img_files)
        self.n = n
        self.indices = np.arange(n)
        self.batch_index = np.floor(np.arange(n) / batch_size).astype(int)

        if self.rect:
            self._setup_rect_batches(batch_size)

        self.ims: List[Optional[np.ndarray]] = [None] * n
        self.im_hw0: List[Optional[Tuple[int, int]]] = [None] * n
        self.im_hw: List[Optional[Tuple[int, int]]] = [None] * n
        if cache_images:
            with ThreadPoolExecutor(8) as ex:
                for i, (im, hw0, hw) in enumerate(ex.map(self._load_image_raw, range(n))):
                    self.ims[i], self.im_hw0[i], self.im_hw[i] = im, hw0, hw

    # -- caching ---------------------------------------------------------------

    def _cache_path(self) -> Path:
        lbl = Path(self.label_files[0])
        return (lbl.parent if lbl.parent.exists() else Path(self.img_files[0]).parent).with_suffix(".cache")

    def _load_or_build_cache(self) -> Dict:
        cache_path = self._cache_path()
        want_hash = get_hash(self.label_files + self.img_files)
        if cache_path.is_file():
            try:
                data = np.load(cache_path, allow_pickle=True).item()
                if data.get("version") == CACHE_VERSION and data.get("hash") == want_hash:
                    return data["items"]
            except Exception:
                pass

        items: Dict = {}
        nf = nm = nc = 0
        with ThreadPoolExecutor(8) as ex:
            for img, labels, shape, f, m, c, msg in ex.map(
                verify_image_label, zip(self.img_files, self.label_files)
            ):
                nf += f
                nm += m
                nc += c
                if msg:
                    LOGGER.warning(msg)
                if img is not None:
                    items[img] = (labels, shape)
        # drop corrupt entries
        keep = [f for f in self.img_files if f in items]
        dropped = len(self.img_files) - len(keep)
        if dropped:
            LOGGER.warning("dropped %d corrupt images", dropped)
            idx = [i for i, f in enumerate(self.img_files) if f in items]
            self.img_files = keep
            self.label_files = [self.label_files[i] for i in idx]
        LOGGER.info("dataset scan: %d labeled, %d background, %d corrupt", nf, nm, nc)
        try:
            np.save(str(cache_path), {"version": CACHE_VERSION, "hash": want_hash, "items": items})
            if cache_path.with_suffix(".cache.npy").exists():
                cache_path.with_suffix(".cache.npy").rename(cache_path)
        except Exception as e:
            LOGGER.warning("cache not saved: %s", e)
        return items

    # -- rect batching (dataset.py:233-257) -------------------------------------

    def _setup_rect_batches(self, batch_size: int):
        ar = self.shapes[:, 1] / self.shapes[:, 0]  # h / w
        order = ar.argsort()
        self.img_files = [self.img_files[i] for i in order]
        self.label_files = [self.label_files[i] for i in order]
        self.labels = [self.labels[i] for i in order]
        self.shapes = self.shapes[order]
        ar = ar[order]

        nb = self.batch_index[-1] + 1
        shapes = []
        for i in range(nb):
            ari = ar[self.batch_index == i]
            mini, maxi = ari.min(), ari.max()
            if maxi < 1:
                shapes.append([maxi, 1])
            elif mini > 1:
                shapes.append([1, 1 / mini])
            else:
                shapes.append([1, 1])
        self.batch_shapes = (
            np.ceil(np.array(shapes) * self.img_size / self.stride + self.pad).astype(int)
            * self.stride
        )
        if self.shape_buckets:
            # XLA-friendly rect eval: every distinct batch shape is one jit compile
            # (minutes each through a remote-compile tunnel), so cap the distinct
            # shape count by rounding shapes UP (pad-only — never crops content) on
            # a progressively coarser stride grid until <= shape_buckets remain.
            q = self.stride
            quant = self.batch_shapes
            while len({tuple(s) for s in quant.tolist()}) > self.shape_buckets:
                q *= 2
                quant = (np.ceil(self.batch_shapes / q) * q).astype(int)
            self.batch_shapes = quant

    # -- image IO ---------------------------------------------------------------

    def _load_image_raw(self, i: int):
        """Decode + pre-resize longest side to img_size (keeps aspect)."""
        im = self.ims[i]
        if im is not None:
            return im, self.im_hw0[i], self.im_hw[i]
        path = self.img_files[i]
        if cv2 is not None:
            im = cv2.imread(path)
        else:
            from PIL import Image

            im = np.asarray(Image.open(path).convert("RGB"))[:, :, ::-1].copy()
        if im is None:
            raise FileNotFoundError(f"image not found {path}")
        h0, w0 = im.shape[:2]
        r = self.img_size / max(h0, w0)
        if r != 1 and cv2 is not None:
            interp = cv2.INTER_LINEAR if (self.augment or r > 1) else cv2.INTER_AREA
            im = cv2.resize(im, (int(w0 * r), int(h0 * r)), interpolation=interp)
        return im, (h0, w0), im.shape[:2]

    # -- mosaic (augmentation.py:208-271) ----------------------------------------

    def _load_mosaic(self, index: int) -> Tuple[np.ndarray, np.ndarray]:
        s = self.img_size
        yc = int(self.rng.uniform(-self.mosaic_border[0], 2 * s + self.mosaic_border[0]))
        xc = int(self.rng.uniform(-self.mosaic_border[1], 2 * s + self.mosaic_border[1]))
        indices = [index] + [self.rng.randrange(self.n) for _ in range(3)]
        canvas = np.full((s * 2, s * 2, 3), 114, np.uint8)
        all_labels = []
        for i, idx in enumerate(indices):
            img, _, (h, w) = self._load_image_raw(idx)
            if i == 0:  # top-left
                x1a, y1a, x2a, y2a = max(xc - w, 0), max(yc - h, 0), xc, yc
                x1b, y1b, x2b, y2b = w - (x2a - x1a), h - (y2a - y1a), w, h
            elif i == 1:  # top-right
                x1a, y1a, x2a, y2a = xc, max(yc - h, 0), min(xc + w, s * 2), yc
                x1b, y1b, x2b, y2b = 0, h - (y2a - y1a), min(w, x2a - x1a), h
            elif i == 2:  # bottom-left
                x1a, y1a, x2a, y2a = max(xc - w, 0), yc, xc, min(s * 2, yc + h)
                x1b, y1b, x2b, y2b = w - (x2a - x1a), 0, w, min(y2a - y1a, h)
            else:  # bottom-right
                x1a, y1a, x2a, y2a = xc, yc, min(xc + w, s * 2), min(s * 2, yc + h)
                x1b, y1b, x2b, y2b = 0, 0, min(w, x2a - x1a), min(y2a - y1a, h)
            canvas[y1a:y2a, x1a:x2a] = img[y1b:y2b, x1b:x2b]
            padw, padh = x1a - x1b, y1a - y1b

            labels = self.labels[idx].copy()
            if len(labels):
                xy = np.stack(
                    [
                        labels[:, 0],
                        w * (labels[:, 1] - labels[:, 3] / 2) + padw,
                        h * (labels[:, 2] - labels[:, 4] / 2) + padh,
                        w * (labels[:, 1] + labels[:, 3] / 2) + padw,
                        h * (labels[:, 2] + labels[:, 4] / 2) + padh,
                    ],
                    1,
                )
                all_labels.append(xy)
        labels4 = (
            np.concatenate(all_labels, 0) if all_labels else np.zeros((0, 5), np.float32)
        )
        np.clip(labels4[:, 1:], 0, 2 * s, out=labels4[:, 1:])

        canvas, labels4 = random_perspective(
            canvas, labels4,
            degrees=self.hyp["degrees"], translate=self.hyp["translate"],
            scale=self.hyp["scale"], shear=self.hyp["shear"],
            perspective=self.hyp["perspective"], border=self.mosaic_border,
            rng=self.rng,
        )
        return canvas, labels4  # labels4 xyxy pixels

    # -- item -------------------------------------------------------------------

    def __len__(self) -> int:
        return self.n

    def __getitem__(self, index: int) -> Tuple[np.ndarray, np.ndarray]:
        index = int(self.indices[index])
        hyp = self.hyp

        if self.mosaic and self.rng.random() < hyp["mosaic"]:
            img, labels_xyxy = self._load_mosaic(index)
            if self.rng.random() < hyp["mixup"]:
                img2, labels2 = self._load_mosaic(self.rng.randrange(self.n))
                img, labels_xyxy = mixup(img, labels_xyxy, img2, labels2, self.np_rng)
            h, w = img.shape[:2]
        else:
            img, (h0, w0), (h, w) = self._load_image_raw(index)
            shape = (
                self.batch_shapes[self.batch_index[index]]
                if self.rect
                else (self.img_size, self.img_size)
            )
            img, ratio, pad = letterbox(img, tuple(shape), auto=False, scaleup=self.augment)
            labels = self.labels[index].copy()
            if len(labels):
                labels_xyxy = np.stack(
                    [
                        labels[:, 0],
                        ratio[0] * w * (labels[:, 1] - labels[:, 3] / 2) + pad[0],
                        ratio[1] * h * (labels[:, 2] - labels[:, 4] / 2) + pad[1],
                        ratio[0] * w * (labels[:, 1] + labels[:, 3] / 2) + pad[0],
                        ratio[1] * h * (labels[:, 2] + labels[:, 4] / 2) + pad[1],
                    ],
                    1,
                )
            else:
                labels_xyxy = np.zeros((0, 5), np.float32)
            if self.augment:
                img, labels_xyxy = random_perspective(
                    img, labels_xyxy,
                    degrees=hyp["degrees"], translate=hyp["translate"],
                    scale=hyp["scale"], shear=hyp["shear"],
                    perspective=hyp["perspective"], rng=self.rng,
                )
            h, w = img.shape[:2]

        # xyxy pixels -> xywh normalized
        if len(labels_xyxy):
            labels = np.stack(
                [
                    labels_xyxy[:, 0],
                    (labels_xyxy[:, 1] + labels_xyxy[:, 3]) / 2 / w,
                    (labels_xyxy[:, 2] + labels_xyxy[:, 4]) / 2 / h,
                    (labels_xyxy[:, 3] - labels_xyxy[:, 1]) / w,
                    (labels_xyxy[:, 4] - labels_xyxy[:, 2]) / h,
                ],
                1,
            ).astype(np.float32)
        else:
            labels = np.zeros((0, 5), np.float32)

        if self.augment:
            img = augment_hsv(img, hyp["hsv_h"], hyp["hsv_s"], hyp["hsv_v"], rng=self.rng)
            if self.rng.random() < hyp["flipud"]:
                img, labels = flip_ud(img, labels)
            if self.rng.random() < hyp["fliplr"]:
                img, labels = flip_lr(img, labels)

        return np.ascontiguousarray(img), labels

    def padded_labels(self, labels: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
        """(n, 5) -> fixed (max_labels, 6) [img=0, cls, xywh] + mask."""
        out = np.zeros((self.max_labels, 6), np.float32)
        mask = np.zeros((self.max_labels,), bool)
        n = min(len(labels), self.max_labels)
        if n:
            out[:n, 1:] = labels[:n]
            mask[:n] = True
        return out, mask


class BatchLoader:
    """Threaded prefetching loader yielding fixed-shape batch dicts."""

    def __init__(
        self,
        dataset: AerialDataset,
        batch_size: int = 16,
        shuffle: bool = False,
        workers: int = 4,
        prefetch: int = 2,
        drop_last: bool = False,
        seed: int = 0,
        bgr_to_rgb: bool = True,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.workers = workers
        self.prefetch = prefetch
        self.drop_last = drop_last
        self.rng = np.random.default_rng(seed)
        self.bgr_to_rgb = bgr_to_rgb
        self.epoch = 0
        # C++ decode+letterbox fast path applies to the plain eval pipeline only:
        # jpeg/png files, no augmentation, square letterbox, RGB output
        self._use_native = False
        if not dataset.augment and not dataset.rect and bgr_to_rgb:
            try:
                from .native import native_available

                exts_ok = all(
                    f.rsplit(".", 1)[-1].lower() in ("jpg", "jpeg", "png")
                    for f in dataset.img_files
                )
                self._use_native = exts_ok and native_available()
            except Exception:
                pass

    def __len__(self) -> int:
        n = len(self.dataset)
        return n // self.batch_size if self.drop_last else math.ceil(n / self.batch_size)

    def _native_assemble(self, idxs: Sequence[int]):
        """C++ fast path: batch decode+letterbox straight into one buffer
        (val/detect pipelines: no augmentation, square letterbox)."""
        from .native import prep_batch

        ds = self.dataset
        paths = [ds.img_files[i] for i in idxs]
        s = ds.img_size
        batch, meta, n_ok = prep_batch(paths, s, s, n_threads=max(self.workers, 2))
        imgs, tgts, masks = [], [], []
        for k, i in enumerate(idxs):
            labels = ds.labels[i].copy()
            gain, dw, dh = meta[k]
            w0, h0 = ds.shapes[i]  # (w, h) native
            if len(labels) and gain > 0:
                # normalized-in-original -> normalized-in-letterboxed
                labels[:, 1] = (labels[:, 1] * w0 * gain + dw) / s
                labels[:, 2] = (labels[:, 2] * h0 * gain + dh) / s
                labels[:, 3] = labels[:, 3] * w0 * gain / s
                labels[:, 4] = labels[:, 4] * h0 * gain / s
            t, m = ds.padded_labels(labels)
            imgs.append(batch[k])
            tgts.append(t)
            masks.append(m)
        return imgs, tgts, masks

    def _assemble(self, idxs: Sequence[int]) -> Dict[str, np.ndarray]:
        if self._use_native:
            imgs, tgts, masks = self._native_assemble(idxs)
        else:
            imgs, tgts, masks = [], [], []
            for i in idxs:
                img, labels = self.dataset[i]
                if self.bgr_to_rgb:
                    img = img[:, :, ::-1]
                t, m = self.dataset.padded_labels(labels)
                imgs.append(np.ascontiguousarray(img))
                tgts.append(t)
                masks.append(m)
        # pad the last partial batch to full size (fixed shapes for jit) with
        # wrap-around duplicates of real images — blank frames would pollute the
        # obj-loss mean and BatchNorm statistics once per epoch; eval paths ignore
        # the pad via n_valid either way
        n_valid = len(imgs)
        while len(imgs) < self.batch_size:
            j = (len(imgs) - n_valid) % n_valid
            imgs.append(imgs[j])
            tgts.append(tgts[j])
            masks.append(masks[j])
        return {
            "images": np.stack(imgs),
            "targets": np.stack(tgts),
            "mask": np.stack(masks),
            "n_valid": np.asarray(n_valid, np.int32),
            "indices": np.asarray(list(idxs) + [-1] * (self.batch_size - n_valid)),
        }

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        n = len(self.dataset)
        order = np.arange(n)
        if self.shuffle:
            self.rng.shuffle(order)
        self.epoch += 1
        batches = [
            order[i : i + self.batch_size] for i in range(0, n, self.batch_size)
        ]
        if self.drop_last and len(batches[-1]) < self.batch_size:
            batches = batches[:-1]

        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = object()

        def producer():
            try:
                with ThreadPoolExecutor(self.workers) as ex:
                    for out in ex.map(self._assemble, batches):
                        q.put(out)
            finally:
                q.put(stop)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is stop:
                break
            yield item


def create_dataloader(
    path,
    img_size: int = 640,
    batch_size: int = 16,
    stride: int = 32,
    augment: bool = False,
    hyp: Optional[Dict[str, float]] = None,
    rect: bool = False,
    pad: float = 0.0,
    workers: int = 4,
    shuffle: Optional[bool] = None,
    cache_images: bool = False,
    max_labels: int = 300,
    seed: int = 0,
    shape_buckets: Optional[int] = None,
) -> Tuple[BatchLoader, AerialDataset]:
    """Build (loader, dataset) — signature convention of reference
    create_dataloader (dataset.py:418-469)."""
    dataset = AerialDataset(
        path, img_size=img_size, batch_size=batch_size, augment=augment, hyp=hyp,
        rect=rect, stride=stride, pad=pad, cache_images=cache_images,
        max_labels=max_labels, seed=seed, shape_buckets=shape_buckets,
    )
    loader = BatchLoader(
        dataset, batch_size=batch_size,
        shuffle=(augment if shuffle is None else shuffle) and not rect,
        workers=workers, seed=seed,
    )
    return loader, dataset


def load_dataset(path, **kw) -> AerialDataset:
    """Convenience dataset constructor (reference export, core/data/__init__.py:7)."""
    return AerialDataset(path, **kw)


class InfiniteBatchLoader(BatchLoader):
    """Epoch-boundary-free loader: continuously yields batches, reshuffling between
    passes (reference InfiniteDataLoader/_RepeatSampler worker-reuse semantics,
    loaders.py:83-124). Use `take(n)` or zip with a step range to bound iteration."""

    def __iter__(self):
        while True:
            yield from super().__iter__()

    def take(self, n: int):
        it = iter(self)
        for _ in range(n):
            yield next(it)


# Reference-facing alias (loaders.py:83)
InfiniteDataLoader = InfiniteBatchLoader
