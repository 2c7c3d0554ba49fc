"""Data layer: datasets, loaders, host + on-device augmentation."""
from .augment import (
    AerialAugmentation,
    AerialAugmentor,
    augment_hsv,
    box_candidates,
    cutout,
    flip_lr,
    flip_ud,
    mixup,
    random_perspective,
)
from .dataset import (
    IMG_FORMATS,
    VID_FORMATS,
    AerialDataset,
    BatchLoader,
    create_dataloader,
    find_images,
    get_hash,
    img2label_paths,
    load_dataset,
    verify_image_label,
)
from .loaders import LoadImages, LoadStreams, LoadWebcam
from ..ops.letterbox import letterbox

__all__ = [
    "AerialAugmentation",
    "AerialAugmentor",
    "augment_hsv",
    "box_candidates",
    "cutout",
    "flip_lr",
    "flip_ud",
    "mixup",
    "random_perspective",
    "IMG_FORMATS",
    "VID_FORMATS",
    "AerialDataset",
    "BatchLoader",
    "create_dataloader",
    "find_images",
    "get_hash",
    "img2label_paths",
    "load_dataset",
    "verify_image_label",
    "LoadImages",
    "LoadStreams",
    "LoadWebcam",
    "letterbox",
]
