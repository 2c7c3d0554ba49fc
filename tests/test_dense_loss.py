"""Dense-cotangent ComputeLoss (losses/detection.py::_level_dense).

On collision-free target sets (no two targets sharing an (image, anchor,
cell) assignment slot) the dense formulation must reproduce the exact
gather-based path: loss values AND gradients w.r.t. the prediction maps.
Collisions are the documented deviation (weighted-mean target), not tested
for equality.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from skyeye_tpu.losses.detection import ComputeLoss

# one anchor table, grid units per level (YOLOv5-style)
_ANCHORS = np.array([
    [[1.25, 1.625], [2.0, 3.75], [4.125, 2.875]],
    [[1.875, 3.8125], [3.875, 2.8125], [3.6875, 7.4375]],
    [[3.625, 2.8125], [4.875, 6.1875], [11.65625, 10.1875]],
], np.float32)


def _mk_preds(key, B=2, nc=7):
    shapes = [(B, 16, 16, 3, nc + 5), (B, 8, 8, 3, nc + 5), (B, 4, 4, 3, nc + 5)]
    keys = jax.random.split(key, len(shapes))
    return [jax.random.normal(k, s, jnp.float32) * 0.5 for k, s in zip(keys, shapes)]


def _mk_targets(M=8):
    """Well-separated targets: no (image, anchor, cell) collision at any
    level (>= 3 P5-cells apart, so neighbor-offset cells never overlap)."""
    t = np.zeros((M, 6), np.float32)
    pos = [(0.15, 0.15), (0.55, 0.35), (0.85, 0.75), (0.30, 0.80)]
    for i, (x, y) in enumerate(pos):
        t[i] = [i % 2, i % 7, x, y, 0.12, 0.18]
    valid = np.zeros(M, bool)
    valid[: len(pos)] = True
    return jnp.asarray(t), jnp.asarray(valid)


@pytest.mark.parametrize("use_img_weight", [False, True])
def test_dense_matches_exact_collision_free(use_img_weight):
    preds = _mk_preds(jax.random.PRNGKey(0))
    targets, valid = _mk_targets()
    iw = jnp.array([1.0, 0.5]) if use_img_weight else None

    exact = ComputeLoss(_ANCHORS, num_classes=7)
    dense = ComputeLoss(_ANCHORS, num_classes=7, dense=True)

    le, auxe = exact(preds, targets, valid, img_weight=iw)
    ld, auxd = dense(preds, targets, valid, img_weight=iw)
    np.testing.assert_allclose(np.asarray(ld), np.asarray(le), rtol=2e-5)
    np.testing.assert_allclose(np.asarray(auxd), np.asarray(auxe), rtol=2e-5)

    ge = jax.grad(lambda ps: exact(ps, targets, valid, img_weight=iw)[0])(preds)
    gd = jax.grad(lambda ps: dense(ps, targets, valid, img_weight=iw)[0])(preds)
    for a, b in zip(ge, gd):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-4, atol=1e-7)


def test_dense_all_padding_targets():
    """No valid targets: both paths give the same (pure-objectness) loss."""
    preds = _mk_preds(jax.random.PRNGKey(1))
    targets = jnp.zeros((8, 6), jnp.float32)
    valid = jnp.zeros(8, bool)
    le, _ = ComputeLoss(_ANCHORS, num_classes=7)(preds, targets, valid)
    ld, _ = ComputeLoss(_ANCHORS, num_classes=7, dense=True)(preds, targets, valid)
    assert np.isfinite(np.asarray(ld))
    np.testing.assert_allclose(np.asarray(ld), np.asarray(le), rtol=2e-5)
