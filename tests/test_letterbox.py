"""Letterbox invariants, host and on-device implementations."""
import numpy as np
import jax.numpy as jnp

from skyeye_tpu.ops import letterbox, letterbox_jax
from skyeye_tpu.ops.letterbox import letterbox_params


def test_host_letterbox_shape_and_ratio():
    im = np.full((480, 640, 3), 200, np.uint8)
    out, ratio, (dw, dh) = letterbox(im, (640, 640), auto=False)
    assert out.shape == (640, 640, 3)
    assert abs(ratio[0] - 1.0) < 1e-6
    assert abs(dh - 80.0) < 1e-6 and abs(dw) < 1e-6
    # pad rows are gray 114
    assert np.all(out[:79] == 114)
    assert np.all(out[-79:] == 114)
    # center preserved
    assert np.all(out[81:-81] == 200)


def test_host_letterbox_auto_stride():
    im = np.zeros((500, 388, 3), np.uint8)
    out, _, _ = letterbox(im, 640, auto=True, stride=32)
    assert out.shape[0] % 32 == 0 and out.shape[1] % 32 == 0


def test_jax_letterbox_matches_geometry():
    rng = np.random.default_rng(6)
    im = rng.integers(0, 255, (480, 640, 3)).astype(np.uint8)
    out = np.asarray(letterbox_jax(jnp.asarray(im), (640, 640)))
    assert out.shape == (640, 640, 3)
    # pad region exactly 114
    assert np.all(out[:79] == 114.0)
    assert np.all(out[-79:] == 114.0)
    # interior equals original (gain is exactly 1.0 here, so resample is identity)
    np.testing.assert_allclose(out[80:560], im.astype(np.float32), atol=1e-3)


def test_jax_letterbox_downscale_close_to_cv2():
    import cv2

    rng = np.random.default_rng(7)
    im = rng.integers(0, 255, (720, 1280, 3)).astype(np.uint8)
    ours = np.asarray(letterbox_jax(jnp.asarray(im), (640, 640)))
    theirs, _, _ = letterbox(im, (640, 640), auto=False)
    r, dw, dh = letterbox_params((720, 1280), (640, 640))
    # compare interiors (away from the pad seam); bilinear implementations differ
    # slightly at edges but must agree in the interior
    t, b = int(dh) + 2, 640 - int(dh) - 2
    diff = np.abs(ours[t:b, 2:-2] - theirs[t:b, 2:-2].astype(np.float32))
    assert np.mean(diff) < 2.0
