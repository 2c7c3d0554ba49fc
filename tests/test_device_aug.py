"""On-device augmentation tests: HSV round-trip, mosaic geometry, label transport."""
import jax
import jax.numpy as jnp
import numpy as np

from skyeye_tpu.data.device_aug import (
    augment_batch_device,
    flip_batch,
    hsv_jitter_batch,
    hsv_to_rgb,
    mosaic_affine_batch,
    rgb_to_hsv,
)

KEY = jax.random.PRNGKey(0)


def test_hsv_roundtrip():
    rng = np.random.default_rng(0)
    rgb = jnp.asarray(rng.uniform(0, 1, (2, 16, 16, 3)).astype(np.float32))
    back = hsv_to_rgb(rgb_to_hsv(rgb))
    np.testing.assert_allclose(np.asarray(back), np.asarray(rgb), atol=1e-5)


def test_hsv_jitter_zero_gain_identity():
    rng = np.random.default_rng(1)
    img = jnp.asarray(rng.uniform(0, 1, (2, 8, 8, 3)).astype(np.float32))
    out = hsv_jitter_batch(img, KEY, hgain=0.0, sgain=0.0, vgain=0.0)
    np.testing.assert_allclose(np.asarray(out), np.asarray(img), atol=1e-5)


def test_hsv_jitter_changes_image():
    rng = np.random.default_rng(2)
    img = jnp.asarray(rng.uniform(0.2, 0.8, (1, 8, 8, 3)).astype(np.float32))
    out = hsv_jitter_batch(img, KEY, hgain=0.1, sgain=0.7, vgain=0.4)
    assert not np.allclose(np.asarray(out), np.asarray(img), atol=1e-3)
    assert np.asarray(out).min() >= 0 and np.asarray(out).max() <= 1


def test_flip_batch_geometry():
    B, s, M = 4, 8, 2
    img = jnp.asarray(np.arange(B * s * s * 3, dtype=np.float32).reshape(B, s, s, 3))
    t = jnp.zeros((B, M, 6)).at[:, :, 2].set(0.25).at[:, :, 3].set(0.4)
    out, t2 = flip_batch(img, t, KEY, p_lr=1.0, p_ud=0.0)
    np.testing.assert_allclose(np.asarray(t2[..., 2]), 0.75, atol=1e-6)
    np.testing.assert_allclose(np.asarray(t2[..., 3]), 0.4, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(out[:, :, 0]), np.asarray(img[:, :, -1]))


def test_mosaic_no_warp_quadrants():
    """With identity affine (degrees=translate=scale=shear=0), the output equals the
    canvas region [s/2..3s/2] around the mosaic center — every pixel comes from one
    of the 4 source images or pad."""
    B, s = 4, 32
    # distinct constant images
    vals = np.array([0.2, 0.4, 0.6, 0.8], np.float32)
    images = jnp.asarray(np.broadcast_to(vals[:, None, None, None], (B, s, s, 3)).copy())
    targets = jnp.zeros((B, 2, 6)).at[:, 0].set(
        jnp.array([0, 1.0, 0.5, 0.5, 0.5, 0.5])
    )
    mask = jnp.zeros((B, 2), bool).at[:, 0].set(True)
    hyp = {"degrees": 0.0, "translate": 0.0, "scale": 0.0, "shear": 0.0}
    out, t, m = mosaic_affine_batch(images, targets, mask, KEY, hyp)
    out = np.asarray(out)
    assert out.shape == (B, s, s, 3)
    # every output pixel is one of the 4 source constants or the pad value
    uniq = np.unique(np.round(out, 3))
    allowed = np.concatenate([vals, [114.0 / 255.0]])
    dist = np.abs(uniq[:, None] - allowed[None, :]).min(1)
    assert (dist < 2e-3).all(), (uniq, allowed)
    assert t.shape == (B, 8, 6) and m.shape == (B, 8)
    # some labels survive
    assert np.asarray(m).sum() > 0
    tt = np.asarray(t)[np.asarray(m)]
    assert np.all(tt[:, 2:] >= 0) and np.all(tt[:, 2:] <= 1 + 1e-5)


def test_mosaic_label_center_mapping():
    """A centered box in the TL source lands where the quadrant math says."""
    B, s = 4, 64
    images = jnp.full((B, s, s, 3), 0.5)
    targets = jnp.zeros((B, 1, 6)).at[0, 0].set(jnp.array([0, 2.0, 0.5, 0.5, 0.4, 0.4]))
    mask = jnp.zeros((B, 1), bool).at[0, 0].set(True)
    hyp = {"degrees": 0.0, "translate": 0.0, "scale": 0.0, "shear": 0.0}
    # whether the TL box survives depends on the random mosaic center; across a
    # handful of keys it must survive at least once, always class-preserving
    kept_rows = []
    for seed in range(6):
        out, t, m = mosaic_affine_batch(
            images, targets, mask, jax.random.PRNGKey(seed), hyp
        )
        t, m = np.asarray(t), np.asarray(m)
        kept_rows.append(t[0][m[0]])
    kept = np.concatenate(kept_rows, axis=0)
    assert len(kept) >= 1
    assert np.all(kept[:, 1] == 2.0)  # class preserved


def test_single_image_affine_branch():
    """mosaic_p=0 selects the reference's NON-mosaic branch per image: the same
    random affine on the single letterboxed image (dataset.py __getitem__
    else-branch). With an identity affine the image and labels pass through
    exactly; pixels from the other batch images never leak in; only slot-0
    labels survive. Regression for the round-3 devaug-parity gap, where
    disabling mosaic silently dropped the affine stage entirely."""
    B, s, M = 4, 32, 2
    vals = np.array([0.2, 0.4, 0.6, 0.8], np.float32)
    images = jnp.asarray(np.broadcast_to(vals[:, None, None, None], (B, s, s, 3)).copy())
    targets = jnp.zeros((B, M, 6)).at[:, 0].set(jnp.array([0, 1.0, 0.5, 0.5, 0.5, 0.5]))
    mask = jnp.zeros((B, M), bool).at[:, 0].set(True)
    hyp = {"degrees": 0.0, "translate": 0.0, "scale": 0.0, "shear": 0.0}
    out, t, m = mosaic_affine_batch(images, targets, mask, KEY, hyp, mosaic_p=0.0)
    out, t, m = np.asarray(out), np.asarray(t), np.asarray(m)
    # identity affine on the single image: exact pass-through, no leakage
    np.testing.assert_allclose(out, np.asarray(images), atol=2e-3)
    # only slot-0 labels survive, unchanged
    assert m.shape == (B, 4 * M)
    assert m[:, :M].sum() == B and m[:, M:].sum() == 0
    kept = t[:, 0]
    np.testing.assert_allclose(kept[:, 2:], 0.5, atol=1e-5)

    # non-identity: a pure zoom-in keeps the affine alive on the single image
    hyp2 = {"degrees": 0.0, "translate": 0.0, "scale": 0.0, "shear": 0.0}
    rng = np.random.default_rng(5)
    patterned = jnp.asarray(rng.uniform(0, 1, (B, s, s, 3)).astype(np.float32))
    out0, _, _ = mosaic_affine_batch(patterned, targets, mask, KEY, hyp2, mosaic_p=0.0)
    hyp3 = {"degrees": 0.0, "translate": 0.0, "scale": 0.4, "shear": 0.0}
    out3, _, _ = mosaic_affine_batch(patterned, targets, mask, KEY, hyp3, mosaic_p=0.0)
    assert not np.allclose(np.asarray(out0), np.asarray(out3))


def test_full_pipeline_jit_and_shapes():
    B, s, M = 8, 64, 10
    rng = np.random.default_rng(4)
    images = jnp.asarray(rng.uniform(0, 1, (B, s, s, 3)).astype(np.float32))
    targets = jnp.zeros((B, M, 6)).at[:, 0].set(
        jnp.array([0, 1.0, 0.5, 0.5, 0.3, 0.3])
    )
    mask = jnp.zeros((B, M), bool).at[:, 0].set(True)

    fn = jax.jit(lambda i, t, m, k: augment_batch_device(i, t, m, k))
    out, t2, m2 = fn(images, targets, mask, KEY)
    assert out.shape == (B, s, s, 3)
    assert t2.shape == (B, 4 * M, 6)
    assert m2.shape == (B, 4 * M)
    assert np.isfinite(np.asarray(out)).all()
    # second call with a different key reuses the compiled program
    out2, _, _ = fn(images, targets, mask, jax.random.PRNGKey(9))
    assert not np.allclose(np.asarray(out), np.asarray(out2))


def test_mixup_batch_blend_and_targets():
    from skyeye_tpu.data.device_aug import mixup_batch

    B, s, M = 4, 16, 3
    images = jnp.stack([jnp.full((s, s, 3), v) for v in (0.0, 0.25, 0.5, 0.75)])
    targets = jnp.zeros((B, M, 6)).at[:, 0, 1].set(jnp.arange(B, dtype=jnp.float32))
    targets = targets.at[:, 0, 2:].set(0.5)
    mask = jnp.zeros((B, M), bool).at[:, 0].set(True)
    out, t, m = mixup_batch(images, targets, mask, jax.random.PRNGKey(0), p=1.0)
    assert out.shape == images.shape
    assert t.shape == (B, 2 * M, 6) and m.shape == (B, 2 * M)
    # each blended image is between its two parents
    v0 = float(out[0, 0, 0, 0])
    assert 0.0 <= v0 <= 0.5 + 1e-6  # parents are 0.0 and 0.5 (roll by 2)
    # both parents' targets carried
    assert bool(m[0, 0]) and bool(m[0, M])
    assert float(t[0, M, 1]) == 2.0  # partner image (i+2)%4 class id


def test_full_pipeline_with_mixup():
    B, s, M = 4, 32, 4
    rng = np.random.default_rng(5)
    images = jnp.asarray(rng.uniform(0, 1, (B, s, s, 3)).astype(np.float32))
    targets = jnp.zeros((B, M, 6)).at[:, 0].set(jnp.array([0, 1.0, 0.5, 0.5, 0.3, 0.3]))
    mask = jnp.zeros((B, M), bool).at[:, 0].set(True)
    out, t, m = augment_batch_device(images, targets, mask, KEY,
                                     hyp={"mixup": 1.0}, use_mosaic=True)
    assert t.shape == (B, 8 * M, 6)  # mosaic 4x then mixup 2x
    assert np.isfinite(np.asarray(out)).all()
