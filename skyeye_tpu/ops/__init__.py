"""TPU-native ops: box math, fixed-shape NMS, on-device letterbox, Pallas kernels."""
from .boxes import (
    bbox_iou,
    box_iou,
    clip_boxes,
    scale_boxes,
    xywh2xyxy,
    xywhn2xyxy,
    xyxy2xywh,
    xyxy2xywhn,
)
from .letterbox import letterbox, letterbox_batch_jax, letterbox_jax
from .nms import nms_batched, nms_single, non_max_suppression
from .tiling import detect_tiled, merge_tile_detections, slice_tiles, tile_grid

__all__ = [
    "bbox_iou",
    "box_iou",
    "clip_boxes",
    "scale_boxes",
    "xywh2xyxy",
    "xywhn2xyxy",
    "xyxy2xywh",
    "xyxy2xywhn",
    "letterbox",
    "letterbox_jax",
    "letterbox_batch_jax",
    "nms_single",
    "nms_batched",
    "non_max_suppression",
    "detect_tiled",
    "merge_tile_detections",
    "slice_tiles",
    "tile_grid",
]
