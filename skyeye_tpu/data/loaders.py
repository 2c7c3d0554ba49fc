"""Inference-source loaders: images/videos/globs, webcams, network streams.

Capability parity: `LoadImages`, `LoadStreams`, `LoadWebcam` are exported and consumed
by the reference detect CLI (skyeye/core/data/__init__.py:14, skyeye/cli/detect.py:22,
iterator protocol `for path, im, im0s, vid_cap, s in dataset` with `.mode`, `.count`,
`.frame` attributes, detect.py:129-214) but were never implemented in the snapshot
(SURVEY.md D6). Implemented here with YOLOv5 iterator semantics.

Each iteration yields (path, img, img0, vid_cap, s):
  img  — letterboxed HWC RGB uint8 (network input; contiguity for zero-copy H2D)
  img0 — original BGR frame (for annotation/saving)
"""
from __future__ import annotations

import glob
import math
import os
import time
from pathlib import Path
from threading import Thread
from typing import List, Optional

import numpy as np

try:
    import cv2
except Exception:  # pragma: no cover
    cv2 = None

from ..ops.letterbox import letterbox
from ..utils.general import LOGGER
from .dataset import IMG_FORMATS, VID_FORMATS


def _prep(img0: np.ndarray, img_size, stride: int, auto: bool) -> np.ndarray:
    img = letterbox(img0, img_size, stride=stride, auto=auto)[0]
    img = img[:, :, ::-1]  # BGR -> RGB
    return np.ascontiguousarray(img)


class LoadImages:
    """Iterate image files, directories, globs, and video files."""

    def __init__(self, path, img_size=640, stride: int = 32, auto: bool = False):
        p = str(Path(path).resolve())
        if "*" in p:
            files = sorted(glob.glob(p, recursive=True))
        elif os.path.isdir(p):
            files = sorted(glob.glob(os.path.join(p, "*.*")))
        elif os.path.isfile(p):
            files = [p]
        else:
            raise FileNotFoundError(f"{p} does not exist")

        images = [f for f in files if f.split(".")[-1].lower() in IMG_FORMATS]
        videos = [f for f in files if f.split(".")[-1].lower() in VID_FORMATS]
        self.img_size = img_size
        self.stride = stride
        self.auto = auto
        self.files = images + videos
        self.nf = len(self.files)
        self.video_flag = [False] * len(images) + [True] * len(videos)
        self.mode = "image"
        self.frame = 0
        self.frames = 0
        self.cap: Optional["cv2.VideoCapture"] = None
        if videos:
            self._new_video(videos[0])
        if self.nf == 0:
            raise FileNotFoundError(
                f"no images or videos found in {p} "
                f"(supported: {IMG_FORMATS} {VID_FORMATS})"
            )

    def _new_video(self, path: str):
        self.frame = 0
        self.cap = cv2.VideoCapture(path)
        self.frames = int(self.cap.get(cv2.CAP_PROP_FRAME_COUNT))

    def __iter__(self):
        self.count = 0
        return self

    def __next__(self):
        if self.count == self.nf:
            raise StopIteration
        path = self.files[self.count]

        if self.video_flag[self.count]:
            self.mode = "video"
            ret, img0 = self.cap.read()
            while not ret:
                self.count += 1
                self.cap.release()
                if self.count == self.nf:
                    raise StopIteration
                path = self.files[self.count]
                self._new_video(path)
                ret, img0 = self.cap.read()
            self.frame += 1
            s = f"video {self.count + 1}/{self.nf} ({self.frame}/{self.frames}) {path}: "
        else:
            self.count += 1
            if cv2 is not None:
                img0 = cv2.imread(path)
            else:
                from PIL import Image

                img0 = np.asarray(Image.open(path).convert("RGB"))[:, :, ::-1].copy()
            if img0 is None:
                raise FileNotFoundError(f"image not found {path}")
            s = f"image {self.count}/{self.nf} {path}: "

        img = _prep(img0, self.img_size, self.stride, self.auto)
        return path, img, img0, self.cap, s

    def __len__(self):
        return self.nf


class LoadWebcam:
    """Single local webcam loader (reference capability D6)."""

    def __init__(self, pipe="0", img_size=640, stride: int = 32):
        self.img_size = img_size
        self.stride = stride
        self.pipe = int(pipe) if str(pipe).isnumeric() else pipe
        self.cap = cv2.VideoCapture(self.pipe)
        self.cap.set(cv2.CAP_PROP_BUFFERSIZE, 3)
        self.mode = "webcam"

    def __iter__(self):
        self.count = -1
        return self

    def __next__(self):
        self.count += 1
        if cv2.waitKey(1) == ord("q"):
            self.cap.release()
            cv2.destroyAllWindows()
            raise StopIteration
        ret, img0 = self.cap.read()
        if not ret:
            raise StopIteration
        img0 = cv2.flip(img0, 1)  # mirror
        img = _prep(img0, self.img_size, self.stride, auto=False)
        return str(self.pipe), img, img0, None, f"webcam {self.count}: "

    def __len__(self):
        return 0


class LoadStreams:
    """Multi-stream loader (webcams / RTSP / HTTP), one capture thread per source.

    The batch dimension equals the number of streams (detect.py:118); frames are
    letterboxed to a common shape so the whole multi-stream batch is one device
    launch.
    """

    def __init__(self, sources="streams.txt", img_size=640, stride: int = 32,
                 auto: bool = False, vid_stride: int = 1):
        self.mode = "stream"
        self.img_size = img_size
        self.stride = stride
        self.auto = auto
        self.vid_stride = vid_stride

        if os.path.isfile(sources):
            srcs = [s.strip() for s in Path(sources).read_text().splitlines() if s.strip()]
        else:
            srcs = [sources]
        n = len(srcs)
        self.sources = srcs
        self.imgs: List[Optional[np.ndarray]] = [None] * n
        self.fps = [0.0] * n
        self.frames = [0] * n
        self.threads: List[Optional[Thread]] = [None] * n

        for i, s in enumerate(srcs):
            src = int(s) if s.isnumeric() else s
            cap = cv2.VideoCapture(src)
            if not cap.isOpened():
                raise ConnectionError(f"failed to open stream {s}")
            w = int(cap.get(cv2.CAP_PROP_FRAME_WIDTH))
            h = int(cap.get(cv2.CAP_PROP_FRAME_HEIGHT))
            fps = cap.get(cv2.CAP_PROP_FPS)
            self.frames[i] = max(int(cap.get(cv2.CAP_PROP_FRAME_COUNT)), 0) or float("inf")
            self.fps[i] = max((fps if math.isfinite(fps) else 0) % 100, 0) or 30
            ok, self.imgs[i] = cap.read()
            if not ok:
                raise ConnectionError(f"failed to read from stream {s}")
            self.threads[i] = Thread(target=self._update, args=(i, cap, src), daemon=True)
            LOGGER.info("stream %d/%d %s: %dx%d at %.1f fps", i + 1, n, s, w, h, self.fps[i])
            self.threads[i].start()

    def _update(self, i: int, cap, src):
        n, f = 0, self.frames[i]
        while cap.isOpened() and n < f:
            n += 1
            cap.grab()
            if n % self.vid_stride == 0:
                ok, im = cap.retrieve()
                self.imgs[i] = im if ok else np.zeros_like(self.imgs[i])
                if not ok:
                    LOGGER.warning("stream %s: frame read failed, reopening", src)
                    cap.open(src)
            time.sleep(0.0)
        cap.release()

    def __iter__(self):
        self.count = -1
        return self

    def __next__(self):
        self.count += 1
        if not all(t.is_alive() for t in self.threads if t) or (
            cv2 is not None and cv2.waitKey(1) == ord("q")
        ):
            cv2.destroyAllWindows()
            raise StopIteration
        img0 = [im.copy() for im in self.imgs]
        img = np.stack([_prep(im, self.img_size, self.stride, self.auto) for im in img0])
        return self.sources, img, img0, None, ""

    def __len__(self):
        return len(self.sources)
