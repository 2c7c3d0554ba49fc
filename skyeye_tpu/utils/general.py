"""General utilities: logging, paths, seeds, dataset checks, misc helpers.

Capability parity (reference /root/reference/skyeye/utils/general.py plus the
declared-but-missing helpers the reference CLIs import — SURVEY.md §2.7#5):
  LOGGER / set_logging      <- general.py:21-42 (rank-aware level)
  colorstr                  <- general.py:45-78
  check_online              <- general.py:81-93
  check_file / check_yaml   <- general.py:96-149
  check_version             <- general.py:152-172
  check_requirements        <- general.py:175-231 (no auto-pip in this environment;
                               reports missing packages instead)
  make_divisible            <- general.py:234-246
  check_img_size            <- general.py:249-268
  is_ascii / is_chinese     <- general.py:271-296
  increment_path            <- general.py:299-330
  init_seeds, check_dataset, get_latest_run, labels_to_class_weights, print_args,
  strip_optimizer, output_to_target  <- imported by reference train/validate but never
  defined (train.py:35-38, validate.py:23-27); implemented with YOLOv5 semantics.
"""
from __future__ import annotations

import glob
import logging
import math
import os
import random
import re
import socket
import urllib.parse
from pathlib import Path
from typing import Dict, List, Optional, Sequence

import numpy as np
import yaml


def set_logging(name: str = "skyeye_tpu", verbose: bool = True) -> logging.Logger:
    """Configure the module logger; non-main JAX processes log warnings only."""
    try:
        import jax

        main = jax.process_index() == 0
    except Exception:
        main = True
    level = logging.INFO if (verbose and main) else logging.WARNING
    logger = logging.getLogger(name)
    if not logger.handlers:
        h = logging.StreamHandler()
        h.setFormatter(logging.Formatter("%(message)s"))
        logger.addHandler(h)
    logger.setLevel(level)
    logger.propagate = False
    return logger


LOGGER = set_logging()


def colorstr(*args) -> str:
    """ANSI color wrapper: colorstr('blue', 'bold', text)."""
    *prefix, string = args if len(args) > 1 else ("blue", "bold", args[0])
    colors = {
        "black": "\033[30m", "red": "\033[31m", "green": "\033[32m",
        "yellow": "\033[33m", "blue": "\033[34m", "magenta": "\033[35m",
        "cyan": "\033[36m", "white": "\033[37m",
        "bright_black": "\033[90m", "bright_red": "\033[91m",
        "bright_green": "\033[92m", "bright_yellow": "\033[93m",
        "bright_blue": "\033[94m", "bright_magenta": "\033[95m",
        "bright_cyan": "\033[96m", "bright_white": "\033[97m",
        "end": "\033[0m", "bold": "\033[1m", "underline": "\033[4m",
    }
    return "".join(colors.get(x, "") for x in prefix) + str(string) + colors["end"]


def check_online(timeout: float = 2.0) -> bool:
    try:
        socket.create_connection(("1.1.1.1", 443), timeout=timeout).close()
        return True
    except OSError:
        return False


def check_file(file, download_dir: str = ".") -> str:
    """Resolve a file path; search common config locations; URLs are not fetched in
    this zero-egress environment (reference downloads them, general.py:96-149)."""
    file = str(file)
    if not file or Path(file).is_file():
        return file
    if file.startswith(("http://", "https://")):
        dest = Path(download_dir) / Path(urllib.parse.urlparse(file).path).name
        if dest.is_file():
            return str(dest)
        raise FileNotFoundError(f"cannot fetch {file} (no network egress)")
    pkg_root = Path(__file__).resolve().parents[2]
    for base in (pkg_root / "configs",):
        hits = sorted(base.rglob(Path(file).name))
        if hits:
            return str(hits[0])
    raise FileNotFoundError(f"file not found: {file}")


def check_yaml(file) -> str:
    return check_file(file)


def check_version(current: str, minimum: str = "0.0.0", name: str = "version",
                  hard: bool = False) -> bool:
    def parse(v):
        return tuple(int(x) for x in re.findall(r"\d+", v)[:3])

    ok = parse(current) >= parse(minimum)
    if hard and not ok:
        raise AssertionError(f"{name} {minimum} required, found {current}")
    return ok


def check_requirements(requirements: Sequence[str] = (), exclude: Sequence[str] = ()) -> List[str]:
    """Report (not install — no egress) missing requirements."""
    import importlib

    missing = []
    for r in requirements:
        name = re.split(r"[><=!]", r)[0].strip()
        if name in exclude:
            continue
        try:
            importlib.import_module(name.replace("-", "_"))
        except ImportError:
            missing.append(r)
    if missing:
        LOGGER.warning("missing requirements (cannot auto-install): %s", missing)
    return missing


def make_divisible(x: float, divisor: int) -> int:
    return math.ceil(x / divisor) * divisor


def check_img_size(imgsz, s: int = 32, floor: int = 0):
    """Round image size(s) up to a multiple of the stride."""
    if isinstance(imgsz, int):
        new = max(make_divisible(imgsz, int(s)), floor)
    else:
        new = [max(make_divisible(x, int(s)), floor) for x in imgsz]
    if new != imgsz:
        LOGGER.warning("img size %s must be a multiple of %d, using %s", imgsz, s, new)
    return new


def is_ascii(s) -> bool:
    return len(str(s).encode().decode("ascii", "ignore")) == len(str(s))


def is_chinese(s) -> bool:
    return bool(re.search("[一-鿿]", str(s)))


def increment_path(path, exist_ok: bool = False, sep: str = "", mkdir: bool = False) -> Path:
    """runs/exp -> runs/exp2, exp3, ... (reference general.py:299-330)."""
    path = Path(path)
    if path.exists() and not exist_ok:
        path, suffix = (path.with_suffix(""), path.suffix) if path.is_file() else (path, "")
        for n in range(2, 9999):
            p = f"{path}{sep}{n}{suffix}"
            if not os.path.exists(p):
                path = Path(p)
                break
    if mkdir:
        path.mkdir(parents=True, exist_ok=True)
    return path


def init_seeds(seed: int = 0) -> None:
    random.seed(seed)
    np.random.seed(seed)


def get_latest_run(search_dir: str = ".") -> str:
    """Most recent last checkpoint under search_dir (for --resume)."""
    paths = glob.glob(f"{search_dir}/**/last*", recursive=True)
    return max(paths, key=os.path.getctime) if paths else ""


def check_dataset(data, autodownload: bool = False):
    """Validate a data YAML / dict, resolve split paths (reference hook,
    train.py:80-81). Returns the DataConfig."""
    from ..config import DataConfig

    if isinstance(data, DataConfig):
        cfg = data
    elif isinstance(data, dict):
        import tempfile

        with tempfile.NamedTemporaryFile("w", suffix=".yaml", delete=False) as f:
            yaml.safe_dump(data, f)
        cfg = DataConfig.from_yaml(f.name)
    else:
        cfg = DataConfig.from_yaml(check_yaml(data))
    for split in ("train", "val"):
        p = getattr(cfg, split)
        if p and not Path(p).exists():
            LOGGER.warning("dataset split %s not found at %s", split, p)
    return cfg


def labels_to_class_weights(labels: Sequence[np.ndarray], nc: int = 80) -> np.ndarray:
    """Inverse-frequency class weights from dataset labels (YOLOv5 convention)."""
    if not len(labels):
        return np.ones(nc) / nc
    classes = np.concatenate([l[:, 0] for l in labels if len(l)], 0).astype(int) \
        if any(len(l) for l in labels) else np.zeros(0, int)
    counts = np.bincount(classes, minlength=nc).astype(float)
    counts[counts == 0] = 1
    weights = 1.0 / counts
    return weights / weights.sum()


def print_args(args: Optional[Dict] = None, show_file: bool = True) -> None:
    LOGGER.info(", ".join(f"{k}={v}" for k, v in (args or {}).items()))


def strip_optimizer(ckpt_dir, half: bool = False) -> None:
    """Remove optimizer/EMA-counter state from a saved checkpoint dir, keeping only
    EMA params for deployment (reference strip_optimizer convention, train.py:37)."""
    from . import checkpoint as ckpt_mod

    ckpt_mod.strip_checkpoint(ckpt_dir, half=half)


def output_to_target(outputs: Sequence[np.ndarray]) -> np.ndarray:
    """Detections list [(n,6) xyxy,conf,cls per image] -> plot targets
    (img_idx, cls, xywh, conf) (used by reference validate.py:301)."""
    rows = []
    for i, det in enumerate(outputs):
        for *xyxy, conf, cls in det:
            x1, y1, x2, y2 = xyxy
            rows.append([i, cls, (x1 + x2) / 2, (y1 + y2) / 2, x2 - x1, y2 - y1, conf])
    return np.array(rows) if rows else np.zeros((0, 7))
