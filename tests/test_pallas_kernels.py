"""Pallas kernel tests (interpret mode on the CPU test mesh)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from skyeye_tpu.ops.nms import _greedy_nms
from skyeye_tpu.ops.pallas import attention_reference, flash_attention, pallas_greedy_nms
from skyeye_tpu.ops.pallas.attention_kernel import padded_flash_attention


def make_candidates(rng, k=256, n_real=100):
    cx = rng.uniform(50, 600, k)
    cy = rng.uniform(50, 600, k)
    w = rng.uniform(10, 80, k)
    h = rng.uniform(10, 80, k)
    boxes = np.stack([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], 1).astype(np.float32)
    scores = rng.uniform(0.1, 1.0, k).astype(np.float32)
    scores[n_real:] = -1.0  # padding slots
    return boxes, scores


def test_pallas_nms_matches_lax_reference():
    rng = np.random.default_rng(0)
    boxes, scores = make_candidates(rng)
    ref_idx, ref_valid = _greedy_nms(jnp.asarray(boxes), jnp.asarray(scores), 0.45, 64)
    got_idx, got_valid = pallas_greedy_nms(
        jnp.asarray(boxes), jnp.asarray(scores), max_det=64, iou_thres=0.45,
        interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(ref_valid), np.asarray(got_valid))
    np.testing.assert_array_equal(np.asarray(ref_idx), np.asarray(got_idx))


def test_pallas_nms_empty():
    boxes = jnp.zeros((128, 4), jnp.float32)
    scores = jnp.full((128,), -1.0, jnp.float32)
    idx, valid = pallas_greedy_nms(boxes, scores, max_det=16, interpret=True)
    assert not np.asarray(valid).any()


def test_pallas_nms_identical_boxes_suppressed():
    boxes = jnp.tile(jnp.array([[10.0, 10.0, 50.0, 50.0]]), (128, 1))
    scores = jnp.linspace(1.0, 0.5, 128)
    idx, valid = pallas_greedy_nms(boxes, scores, max_det=16, iou_thres=0.5,
                                   interpret=True)
    v = np.asarray(valid)
    assert v.sum() == 1
    assert int(np.asarray(idx)[0]) == 0  # highest score wins


def test_flash_attention_matches_reference():
    rng = np.random.default_rng(1)
    B, N, hd = 2, 256, 64
    q = jnp.asarray(rng.normal(0, 1, (B, N, hd)).astype(np.float32))
    k = jnp.asarray(rng.normal(0, 1, (B, N, hd)).astype(np.float32))
    v = jnp.asarray(rng.normal(0, 1, (B, N, hd)).astype(np.float32))
    ref = attention_reference(q, k, v)
    got = flash_attention(q, k, v, block_q=128, block_k=128, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-4, atol=2e-5)


@pytest.mark.parametrize("N,hd", [(400, 64), (1600, 128), (400, 96)])
def test_padded_flash_attention_matches_reference(N, hd):
    """Detection-head token counts (P5 @640 = 400, @1280 = 1600) and head dims that
    need zero-padding + in-kernel masking to tile onto the MXU."""
    rng = np.random.default_rng(3)
    B = 2
    q = jnp.asarray(rng.normal(0, 1, (B, N, hd)).astype(np.float32))
    k = jnp.asarray(rng.normal(0, 1, (B, N, hd)).astype(np.float32))
    v = jnp.asarray(rng.normal(0, 1, (B, N, hd)).astype(np.float32))
    ref = attention_reference(q, k, v)
    got = padded_flash_attention(q, k, v, interpret=True)
    assert got.shape == (B, N, hd)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-4, atol=2e-5)


def test_pallas_nms_under_vmap():
    """nms_batched vmaps the kernel over images; interpret mode checks the lowering."""
    rng = np.random.default_rng(4)
    boxes = []
    scores = []
    for _ in range(3):
        b, s = make_candidates(rng, k=256, n_real=150)
        boxes.append(b)
        scores.append(s)
    bb, ss = jnp.asarray(np.stack(boxes)), jnp.asarray(np.stack(scores))
    got_idx, got_valid = jax.vmap(
        lambda b, s: pallas_greedy_nms(b, s, max_det=64, iou_thres=0.45, interpret=True)
    )(bb, ss)
    ref_idx, ref_valid = jax.vmap(lambda b, s: _greedy_nms(b, s, 0.45, 64))(bb, ss)
    np.testing.assert_array_equal(np.asarray(got_valid), np.asarray(ref_valid))
    np.testing.assert_array_equal(np.asarray(got_idx), np.asarray(ref_idx))


def test_flash_attention_numerically_stable_large_logits():
    rng = np.random.default_rng(2)
    B, N, hd = 1, 128, 64
    q = jnp.asarray(rng.normal(0, 30, (B, N, hd)).astype(np.float32))
    k = jnp.asarray(rng.normal(0, 30, (B, N, hd)).astype(np.float32))
    v = jnp.asarray(rng.normal(0, 1, (B, N, hd)).astype(np.float32))
    got = np.asarray(flash_attention(q, k, v, interpret=True))
    assert np.isfinite(got).all()
    ref = np.asarray(attention_reference(q, k, v))
    np.testing.assert_allclose(got, ref, rtol=1e-3, atol=1e-4)
