"""Data pipeline tests on a synthetic YOLO-format dataset."""
import shutil
from pathlib import Path

import numpy as np
import pytest

from skyeye_tpu.data import (
    AerialDataset,
    AerialAugmentor,
    BatchLoader,
    LoadImages,
    augment_hsv,
    create_dataloader,
    find_images,
    flip_lr,
    img2label_paths,
    mixup,
    random_perspective,
)

cv2 = pytest.importorskip("cv2")


@pytest.fixture(scope="module")
def synth_dataset(tmp_path_factory):
    """Synthetic dataset: colored rectangles on gray; labels = the rectangles."""
    root = tmp_path_factory.mktemp("synth")
    img_dir = root / "images" / "train"
    lbl_dir = root / "labels" / "train"
    img_dir.mkdir(parents=True)
    lbl_dir.mkdir(parents=True)
    rng = np.random.default_rng(0)
    for i in range(12):
        h, w = int(rng.integers(240, 480)), int(rng.integers(320, 640))
        img = np.full((h, w, 3), 128, np.uint8)
        rows = []
        for _ in range(rng.integers(1, 5)):
            bw, bh = int(rng.integers(30, 80)), int(rng.integers(30, 80))
            x1 = int(rng.integers(0, w - bw))
            y1 = int(rng.integers(0, h - bh))
            cls = int(rng.integers(0, 3))
            color = [(255, 0, 0), (0, 255, 0), (0, 0, 255)][cls]
            cv2.rectangle(img, (x1, y1), (x1 + bw, y1 + bh), color, -1)
            rows.append(
                f"{cls} {(x1 + bw / 2) / w:.6f} {(y1 + bh / 2) / h:.6f} {bw / w:.6f} {bh / h:.6f}"
            )
        cv2.imwrite(str(img_dir / f"im{i:03d}.jpg"), img)
        (lbl_dir / f"im{i:03d}.txt").write_text("\n".join(rows))
    return img_dir


def test_img2label_paths():
    out = img2label_paths(["/a/images/train/x.jpg"])
    assert out == ["/a/labels/train/x.txt"]


def test_dataset_discovery_and_cache(synth_dataset):
    ds = AerialDataset(str(synth_dataset), img_size=320, augment=False)
    assert len(ds) == 12
    assert all(len(l.shape) == 2 for l in ds.labels)
    # cache file created; second construction uses it
    cache = ds._cache_path()
    assert cache.exists()
    ds2 = AerialDataset(str(synth_dataset), img_size=320)
    assert len(ds2) == 12


def test_dataset_getitem_no_aug(synth_dataset):
    ds = AerialDataset(str(synth_dataset), img_size=320, augment=False)
    img, labels = ds[0]
    assert img.shape == (320, 320, 3) and img.dtype == np.uint8
    assert labels.ndim == 2 and labels.shape[1] == 5
    # labels normalized
    if len(labels):
        assert labels[:, 1:].min() >= 0 and labels[:, 1:].max() <= 1


def test_dataset_mosaic_aug(synth_dataset):
    ds = AerialDataset(str(synth_dataset), img_size=320, augment=True, seed=3)
    img, labels = ds[0]
    # mosaic: 2s x 2s canvas warped with border -s/2 -> final s x s output
    assert img.shape[0] == img.shape[1] == 320
    if len(labels):
        assert labels[:, 1:].min() >= -1e-6 and labels[:, 1:].max() <= 1 + 1e-6


def test_rect_batching(synth_dataset):
    ds = AerialDataset(str(synth_dataset), img_size=320, batch_size=4, rect=True, pad=0.5)
    assert hasattr(ds, "batch_shapes")
    assert (ds.batch_shapes % 32 == 0).all()
    img, _ = ds[0]
    assert img.shape[0] % 32 == 0 and img.shape[1] % 32 == 0


def test_batch_loader_fixed_shapes(synth_dataset):
    loader, ds = create_dataloader(str(synth_dataset), img_size=320, batch_size=5,
                                   augment=False, max_labels=50)
    batches = list(loader)
    assert len(batches) == 3  # 12 images, bs 5 -> 3 batches (last padded)
    for b in batches:
        assert b["images"].shape == (5, 320, 320, 3)
        assert b["targets"].shape == (5, 50, 6)
        assert b["mask"].shape == (5, 50)
    assert int(batches[-1]["n_valid"]) == 2
    # padding is wrap-around duplicates of real images (not blank frames that would
    # pollute BN stats / obj loss); pad slot i mirrors valid slot i % n_valid
    np.testing.assert_array_equal(b["images"][2], b["images"][0])
    np.testing.assert_array_equal(b["targets"][2], b["targets"][0])
    np.testing.assert_array_equal(b["mask"][3], b["mask"][1])
    # indices mark the pad slots as invalid for eval paths
    assert (b["indices"][2:] == -1).all()


def test_augment_hsv_and_flip():
    rng = np.random.default_rng(1)
    img = rng.integers(0, 255, (64, 64, 3)).astype(np.uint8)
    out = augment_hsv(img.copy(), 0.05, 0.5, 0.5)
    assert out.shape == img.shape and out.dtype == np.uint8

    labels = np.array([[0, 0.25, 0.4, 0.1, 0.2]], np.float32)
    flipped, flabels = flip_lr(img, labels)
    assert abs(flabels[0, 1] - 0.75) < 1e-6
    np.testing.assert_array_equal(flipped[:, 0], img[:, -1])


def test_random_perspective_identity():
    img = np.full((100, 100, 3), 50, np.uint8)
    targets = np.array([[1, 20.0, 20.0, 60.0, 60.0]], np.float32)
    out, t = random_perspective(img, targets.copy(), degrees=0, translate=0,
                                scale=0, shear=0, perspective=0)
    assert out.shape == img.shape
    np.testing.assert_allclose(t[0, 1:], targets[0, 1:], atol=1.0)


def test_mixup_shapes():
    rng = np.random.default_rng(2)
    im1 = rng.integers(0, 255, (64, 64, 3)).astype(np.float32)
    im2 = rng.integers(0, 255, (64, 64, 3)).astype(np.float32)
    l1 = np.array([[0, 10, 10, 20, 20]], np.float32)
    l2 = np.array([[1, 30, 30, 40, 40]], np.float32)
    im, l = mixup(im1, l1, im2, l2, np.random.default_rng(0))
    assert im.shape == im1.shape and len(l) == 2


def test_load_images_iterator(synth_dataset):
    di = LoadImages(str(synth_dataset), img_size=320)
    n = 0
    for path, img, img0, cap, s in di:
        assert img.shape[2] == 3 and img0.shape[2] == 3
        assert img.flags["C_CONTIGUOUS"]
        n += 1
        if n >= 3:
            break
    assert di.mode == "image"


def test_cache_invalidation(synth_dataset):
    ds = AerialDataset(str(synth_dataset), img_size=320)
    lbl = Path(img2label_paths([ds.img_files[0]])[0])
    orig = lbl.read_text()
    try:
        lbl.write_text(orig + "\n2 0.5 0.5 0.1 0.1")
        ds2 = AerialDataset(str(synth_dataset), img_size=320)
        assert len(ds2.labels[ds2.img_files.index(ds.img_files[0])]) == len(
            ds.labels[0]
        ) + 1
    finally:
        lbl.write_text(orig)
        AerialDataset(str(synth_dataset), img_size=320)  # restore cache


def test_infinite_loader_cycles(synth_dataset):
    from skyeye_tpu.data import AerialDataset, InfiniteBatchLoader

    ds = AerialDataset(str(synth_dataset), img_size=320, augment=False)
    loader = InfiniteBatchLoader(ds, batch_size=5, shuffle=True)
    batches = list(loader.take(7))  # 12 imgs / bs 5 = 3 per epoch -> crosses epochs
    assert len(batches) == 7
    assert all(b["images"].shape == (5, 320, 320, 3) for b in batches)


def test_cutout_removes_occluded_labels():
    from skyeye_tpu.data import cutout
    import random as _random

    rng = _random.Random(0)
    img = np.full((128, 128, 3), 100, np.uint8)
    labels = np.array([[0, 0.5, 0.5, 0.2, 0.2]], np.float32)
    out, new_labels = cutout(img, labels, p=1.0, rng=rng)
    assert out.shape == img.shape
    assert not np.array_equal(out, img)  # occlusion squares drawn
    assert len(new_labels) <= len(labels)
