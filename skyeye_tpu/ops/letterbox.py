"""Letterbox resize — host (numpy/cv2) and on-device (JAX) implementations.

Parity target: `letterbox` in /root/reference/skyeye/core/data/augmentation.py:442-496
(aspect-preserving resize, pad to stride multiple with gray value 114, returns
(img, ratio, (dw, dh))).

The on-device variant (`letterbox_jax`) is the TPU-native redesign: it produces a FIXED
output shape (required under jit) and does the resize with a gather-based bilinear/nearest
sampler, so raw decoded frames can be shipped to the device once and the whole
preprocess -> forward -> decode -> NMS path stays on-chip (BASELINE.json north star).
"""
from __future__ import annotations

from typing import Tuple

import numpy as np

try:  # cv2 is a host-only optional dependency
    import cv2
except Exception:  # pragma: no cover
    cv2 = None

import jax
import jax.numpy as jnp

PAD_VALUE = 114


def letterbox(
    im: np.ndarray,
    new_shape=(640, 640),
    color=(PAD_VALUE, PAD_VALUE, PAD_VALUE),
    auto: bool = True,
    scale_fill: bool = False,
    scaleup: bool = True,
    stride: int = 32,
):
    """Host letterbox with reference semantics (augmentation.py:442-496).

    Returns (img, (rw, rh), (dw, dh)).
    """
    shape = im.shape[:2]  # (h, w)
    if isinstance(new_shape, int):
        new_shape = (new_shape, new_shape)

    r = min(new_shape[0] / shape[0], new_shape[1] / shape[1])
    if not scaleup:  # only scale down (better val mAP)
        r = min(r, 1.0)

    ratio = (r, r)
    new_unpad = (int(round(shape[1] * r)), int(round(shape[0] * r)))  # (w, h)
    dw, dh = new_shape[1] - new_unpad[0], new_shape[0] - new_unpad[1]
    if auto:  # minimum rectangle — pad only to stride multiple
        dw, dh = dw % stride, dh % stride
    elif scale_fill:  # stretch
        dw, dh = 0, 0
        new_unpad = (new_shape[1], new_shape[0])
        ratio = (new_shape[1] / shape[1], new_shape[0] / shape[0])

    dw /= 2
    dh /= 2

    if shape[::-1] != new_unpad:
        if cv2 is not None:
            im = cv2.resize(im, new_unpad, interpolation=cv2.INTER_LINEAR)
        else:  # numpy nearest fallback
            ys = np.clip(
                (np.arange(new_unpad[1]) + 0.5) / r - 0.5, 0, shape[0] - 1
            ).round().astype(int)
            xs = np.clip(
                (np.arange(new_unpad[0]) + 0.5) / r - 0.5, 0, shape[1] - 1
            ).round().astype(int)
            im = im[ys][:, xs]
    top, bottom = int(round(dh - 0.1)), int(round(dh + 0.1))
    left, right = int(round(dw - 0.1)), int(round(dw + 0.1))
    if cv2 is not None:
        im = cv2.copyMakeBorder(im, top, bottom, left, right, cv2.BORDER_CONSTANT, value=color)
    else:
        im = np.pad(
            im,
            ((top, bottom), (left, right), (0, 0)),
            constant_values=color[0],
        )
    return im, ratio, (dw, dh)


def letterbox_params(in_shape, out_shape, scaleup: bool = True):
    """Static letterbox geometry: (gain, pad_w, pad_h) for in (h,w) -> out (h,w)."""
    r = min(out_shape[0] / in_shape[0], out_shape[1] / in_shape[1])
    if not scaleup:
        r = min(r, 1.0)
    new_w, new_h = int(round(in_shape[1] * r)), int(round(in_shape[0] * r))
    dw, dh = (out_shape[1] - new_w) / 2, (out_shape[0] - new_h) / 2
    return r, dw, dh


def letterbox_jax(
    im: jnp.ndarray,
    out_shape: Tuple[int, int],
    scaleup: bool = True,
    pad_value: float = float(PAD_VALUE),
):
    """On-device letterbox: (H, W, C) uint8/float -> (out_h, out_w, C) float32.

    Fixed output shape (jit-safe). Bilinear resample expressed as two one-dimensional
    gathers + lerps, which XLA maps onto contiguous VMEM gathers. Padding is a mask
    select instead of a concat so the op fuses with the downstream /255 normalize.
    """
    in_h, in_w = im.shape[0], im.shape[1]
    out_h, out_w = out_shape
    r, dw, dh = letterbox_params((in_h, in_w), (out_h, out_w), scaleup)

    im = im.astype(jnp.float32)

    # Output pixel centers mapped back into input coordinates.
    ys = (jnp.arange(out_h, dtype=jnp.float32) - dh + 0.5) / r - 0.5
    xs = (jnp.arange(out_w, dtype=jnp.float32) - dw + 0.5) / r - 0.5
    valid_y = (ys >= -0.5) & (ys <= in_h - 0.5)
    valid_x = (xs >= -0.5) & (xs <= in_w - 0.5)

    y0 = jnp.clip(jnp.floor(ys), 0, in_h - 1)
    x0 = jnp.clip(jnp.floor(xs), 0, in_w - 1)
    y1 = jnp.clip(y0 + 1, 0, in_h - 1)
    x1 = jnp.clip(x0 + 1, 0, in_w - 1)
    wy = jnp.clip(ys - y0, 0.0, 1.0)
    wx = jnp.clip(xs - x0, 0.0, 1.0)
    y0, y1 = y0.astype(jnp.int32), y1.astype(jnp.int32)
    x0, x1 = x0.astype(jnp.int32), x1.astype(jnp.int32)

    rows0 = im[y0]  # (out_h, in_w, C)
    rows1 = im[y1]
    rows = rows0 + wy[:, None, None] * (rows1 - rows0)  # vertical lerp
    cols0 = rows[:, x0]  # (out_h, out_w, C)
    cols1 = rows[:, x1]
    out = cols0 + wx[None, :, None] * (cols1 - cols0)  # horizontal lerp

    mask = (valid_y[:, None] & valid_x[None, :])[..., None]
    return jnp.where(mask, out, pad_value)


def letterbox_batch_jax(ims, out_shape, scaleup: bool = True):
    """vmapped on-device letterbox over a batch of same-shape frames."""
    return jax.vmap(lambda im: letterbox_jax(im, out_shape, scaleup))(ims)
