"""ctypes bindings for the native C++ preprocessing library (native/skyeye_prep.cc).

Replaces the Python/cv2 decode+letterbox hot loop with a C++ thread pool writing
straight into one NHWC uint8 batch buffer (SURVEY.md §3.1 CPU-side hot loop; the
"native runtime" counterpart to the reference's DataLoader workers).

Degrades gracefully: `native_available()` is False when the .so is missing and the
toolchain can't build it, and callers fall back to the cv2 path.
"""
from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path
from typing import List, Optional, Tuple

import numpy as np

from ..utils.general import LOGGER

_NATIVE_DIR = Path(__file__).resolve().parents[2] / "native"
_LIB_PATH = _NATIVE_DIR / "libskyeye_prep.so"
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not _LIB_PATH.exists() and (_NATIVE_DIR / "Makefile").exists():
        try:  # lazy one-time build
            subprocess.run(["make", "-C", str(_NATIVE_DIR)], check=True,
                           capture_output=True, timeout=120)
        except Exception as e:
            LOGGER.debug("native prep build failed: %s", e)
    if not _LIB_PATH.exists():
        return None
    try:
        lib = ctypes.CDLL(str(_LIB_PATH))
        lib.sp_prep_batch.restype = ctypes.c_int
        lib.sp_prep_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
            ctypes.POINTER(ctypes.c_ubyte), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.POINTER(ctypes.c_float),
        ]
        lib.sp_decode_shape.restype = ctypes.c_int
        lib.sp_decode_shape.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)
        ]
        try:
            lib.sp_prep_batch_s2d4.restype = ctypes.c_int
            lib.sp_prep_batch_s2d4.argtypes = [
                ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
                ctypes.POINTER(ctypes.c_ubyte), ctypes.c_int,
                ctypes.c_int, ctypes.POINTER(ctypes.c_float),
            ]
        except AttributeError:  # older .so without the packed entry point
            pass
        _lib = lib
    except OSError as e:
        LOGGER.debug("native prep load failed: %s", e)
    return _lib


def native_available() -> bool:
    return _load() is not None


def decode_shape(path) -> Optional[Tuple[int, int]]:
    lib = _load()
    if lib is None:
        return None
    h, w = ctypes.c_int(), ctypes.c_int()
    if lib.sp_decode_shape(str(path).encode(), ctypes.byref(h), ctypes.byref(w)) != 0:
        return None
    return h.value, w.value


def prep_batch(
    paths: List[str],
    out_h: int,
    out_w: int,
    n_threads: int = 8,
    out: Optional[np.ndarray] = None,
) -> Tuple[np.ndarray, np.ndarray, int]:
    """Decode + letterbox a batch of image files natively.

    Returns (batch (n, out_h, out_w, 3) RGB uint8, meta (n, 3) [gain, dw, dh],
    n_decoded).
    """
    lib = _load()
    if lib is None:
        raise RuntimeError("native preprocessing library unavailable")
    n = len(paths)
    if out is None:
        out = np.empty((n, out_h, out_w, 3), np.uint8)
    assert out.shape == (n, out_h, out_w, 3) and out.dtype == np.uint8
    meta = np.zeros((n, 3), np.float32)
    arr = (ctypes.c_char_p * n)(*[str(p).encode() for p in paths])
    n_ok = lib.sp_prep_batch(
        arr, n,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
        out_h, out_w, n_threads,
        meta.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    return out, meta, int(n_ok)


def prep_batch_s2d4(
    paths: List[str],
    out_s: int,
    n_threads: int = 8,
) -> Tuple[np.ndarray, np.ndarray, int]:
    """Decode + letterbox + 4x4 space-to-depth pack natively.

    Returns (batch (n, out_s/4, out_s/4, 48) uint8 in the packed-stem layout,
    meta (n, 3) [gain, dw, dh], n_decoded). Identical to
    s2d4_host(prep_batch(...)[0]) but with the pack done in the C++ workers.
    """
    lib = _load()
    if lib is None or not hasattr(lib, "sp_prep_batch_s2d4"):
        raise RuntimeError("native s2d4 preprocessing unavailable")
    assert out_s % 4 == 0, out_s
    n = len(paths)
    out = np.empty((n, out_s // 4, out_s // 4, 48), np.uint8)
    meta = np.zeros((n, 3), np.float32)
    arr = (ctypes.c_char_p * n)(*[str(p).encode() for p in paths])
    n_ok = lib.sp_prep_batch_s2d4(
        arr, n,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
        out_s, n_threads,
        meta.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    return out, meta, int(n_ok)
