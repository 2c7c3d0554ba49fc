"""Native C++ preprocessing library tests (skipped when the toolchain is absent)."""
import numpy as np
import pytest

from skyeye_tpu.data.native import decode_shape, native_available, prep_batch

cv2 = pytest.importorskip("cv2")

pytestmark = pytest.mark.skipif(
    not native_available(), reason="native prep library unavailable"
)


@pytest.fixture(scope="module")
def sample_images(tmp_path_factory):
    root = tmp_path_factory.mktemp("native")
    rng = np.random.default_rng(0)
    paths = []
    shapes = [(480, 640), (720, 1280), (333, 517)]
    for i, (h, w) in enumerate(shapes):
        img = rng.integers(0, 255, (h, w, 3)).astype(np.uint8)
        # smooth it so JPEG round-trip error is small
        img = cv2.GaussianBlur(img, (15, 15), 5)
        p = root / f"im{i}.jpg"
        cv2.imwrite(str(p), img, [cv2.IMWRITE_JPEG_QUALITY, 98])
        paths.append(str(p))
    # plus a PNG (lossless)
    img = rng.integers(0, 255, (256, 320, 3)).astype(np.uint8)
    p = root / "im_png.png"
    cv2.imwrite(str(p), img)
    paths.append(str(p))
    return paths, shapes


def test_decode_shape(sample_images):
    paths, shapes = sample_images
    for p, (h, w) in zip(paths[:3], shapes):
        assert decode_shape(p) == (h, w)


def test_prep_batch_geometry_matches_python(sample_images):
    from skyeye_tpu.ops.letterbox import letterbox, letterbox_params

    paths, shapes = sample_images
    out, meta, n_ok = prep_batch(paths[:3], 640, 640)
    assert n_ok == 3
    assert out.shape == (3, 640, 640, 3)
    for i, (h, w) in enumerate(shapes):
        r, dw, dh = letterbox_params((h, w), (640, 640))
        np.testing.assert_allclose(meta[i], [r, dw, dh], rtol=1e-5)
        # pad rows are exactly 114
        y0 = int(round(dh - 0.1))
        if y0 > 1:
            assert np.all(out[i, : y0 - 1] == 114)
        # interior matches the python/cv2 letterbox closely
        img_bgr = cv2.imread(paths[i])
        ref, _, _ = letterbox(img_bgr, (640, 640), auto=False)
        ref_rgb = ref[:, :, ::-1]
        inner = slice(y0 + 4, 640 - y0 - 4)
        diff = np.abs(out[i, inner].astype(float) - ref_rgb[inner].astype(float))
        assert diff.mean() < 3.0, diff.mean()


def test_prep_batch_png_lossless(sample_images):
    paths, _ = sample_images
    out, meta, n_ok = prep_batch([paths[3]], 320, 320)
    assert n_ok == 1
    img = cv2.imread(paths[3])[:, :, ::-1]  # RGB
    assert out.shape == (1, 320, 320, 3)
    assert meta[0, 0] == 1.0  # 256x320 -> gain exactly 1.0
    # the content region (pad 32 rows top/bottom) matches the original exactly
    np.testing.assert_array_equal(out[0, 32:288], img)


def test_prep_batch_missing_file(sample_images):
    paths, _ = sample_images
    out, meta, n_ok = prep_batch([paths[0], "/nonexistent/x.jpg"], 320, 320)
    assert n_ok == 1
    assert np.all(out[1] == 0)
    assert meta[1, 0] == 0.0


def test_batchloader_native_path_matches_python(tmp_path):
    """Native-assembled batches must agree with the python/cv2 path."""
    from skyeye_tpu.data import AerialDataset, BatchLoader

    rng = np.random.default_rng(3)
    img_dir = tmp_path / "images" / "val"
    lbl_dir = tmp_path / "labels" / "val"
    img_dir.mkdir(parents=True)
    lbl_dir.mkdir(parents=True)
    for i in range(4):
        img = cv2.GaussianBlur(
            rng.integers(0, 255, (240, 320, 3)).astype(np.uint8), (15, 15), 5
        )
        cv2.imwrite(str(img_dir / f"v{i}.jpg"), img, [cv2.IMWRITE_JPEG_QUALITY, 98])
        (lbl_dir / f"v{i}.txt").write_text("1 0.5 0.5 0.25 0.25")

    ds = AerialDataset(str(img_dir), img_size=320, augment=False)
    loader = BatchLoader(ds, batch_size=4, shuffle=False)
    assert loader._use_native
    native_batch = next(iter(loader))

    loader._use_native = False
    py_batch = next(iter(loader))

    # same labels
    np.testing.assert_allclose(
        native_batch["targets"], py_batch["targets"], atol=2e-3
    )
    np.testing.assert_array_equal(native_batch["mask"], py_batch["mask"])
    # similar pixels (different bilinear impls + JPEG decode differences)
    diff = np.abs(
        native_batch["images"].astype(float) - py_batch["images"].astype(float)
    )
    assert diff.mean() < 4.0, diff.mean()


def test_prep_batch_s2d4_matches_numpy_pack(tmp_path):
    """Native letterbox+pack == s2d4_host(native letterbox) exactly."""
    import numpy as np
    import pytest

    from skyeye_tpu.data.native import native_available, prep_batch, prep_batch_s2d4
    from skyeye_tpu.ops.packed_stem import s2d4_host

    if not native_available():
        pytest.skip("native prep unavailable")
    try:
        import cv2
    except ImportError:
        pytest.skip("cv2 needed to write test images")

    rng = np.random.default_rng(0)
    paths = []
    for i, (h, w) in enumerate([(480, 640), (333, 517)]):
        im = rng.integers(0, 255, (h, w, 3)).astype(np.uint8)
        p = tmp_path / f"im{i}.png"
        cv2.imwrite(str(p), im)
        paths.append(str(p))

    S = 128
    plain, meta_a, ok_a = prep_batch(paths, S, S)
    packed, meta_b, ok_b = prep_batch_s2d4(paths, S)
    assert ok_a == ok_b == len(paths)
    np.testing.assert_array_equal(meta_a, meta_b)
    np.testing.assert_array_equal(packed, s2d4_host(plain))
