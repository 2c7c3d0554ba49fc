"""Loss tests: primitives vs torch reference formulas, build_targets on crafted
targets, end-to-end gradient flow."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from skyeye_tpu.config import DEFAULT_ANCHORS
from skyeye_tpu.losses import (
    AerialDetectionLoss,
    ComputeLoss,
    bce_with_logits,
    build_targets_level,
    focal_loss,
    masked_mean,
    modulated_bce,
    smooth_bce,
)

KEY = jax.random.PRNGKey(0)


def test_smooth_bce():
    cp, cn = smooth_bce(0.1)
    assert abs(cp - 0.95) < 1e-9 and abs(cn - 0.05) < 1e-9
    cp, cn = smooth_bce(0.0)
    assert cp == 1.0 and cn == 0.0


def test_bce_matches_torch():
    import torch

    rng = np.random.default_rng(0)
    pred = rng.normal(0, 3, (64,)).astype(np.float32)
    tgt = rng.uniform(0, 1, (64,)).astype(np.float32)
    ours = np.asarray(bce_with_logits(jnp.asarray(pred), jnp.asarray(tgt)))
    theirs = torch.nn.functional.binary_cross_entropy_with_logits(
        torch.tensor(pred), torch.tensor(tgt), reduction="none"
    ).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-3, atol=1e-4)


def test_focal_loss_matches_reference_formula():
    """Direct re-derivation of functions.py:133-156."""
    import torch

    rng = np.random.default_rng(1)
    pred = rng.normal(0, 2, (32,)).astype(np.float32)
    tgt = (rng.uniform(0, 1, (32,)) > 0.5).astype(np.float32)
    gamma, alpha = 1.5, 0.25
    ours = np.asarray(focal_loss(jnp.asarray(pred), jnp.asarray(tgt), gamma, alpha))

    tp, tt = torch.tensor(pred), torch.tensor(tgt)
    bce = torch.nn.functional.binary_cross_entropy_with_logits(tp, tt, reduction="none")
    p = torch.sigmoid(tp)
    p_t = tt * p + (1 - tt) * (1 - p)
    af = tt * alpha + (1 - tt) * (1 - alpha)
    theirs = (af * (1 - p_t) ** gamma * bce).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-3, atol=1e-4)


def test_modulated_bce_bounds():
    pred = jnp.array([0.0, 5.0, -5.0])
    tgt = jnp.array([0.5, 1.0, 0.0])
    out = np.asarray(modulated_bce(pred, tgt))
    assert np.all(out >= 0)
    # confident-correct predictions are strongly down-modulated
    assert out[1] < 1e-2 and out[2] < 1e-2


def test_masked_mean():
    x = jnp.array([1.0, 2.0, 3.0, 100.0])
    m = jnp.array([True, True, True, False])
    assert abs(float(masked_mean(x, m)) - 2.0) < 1e-6
    # empty mask -> 0, not NaN
    assert float(masked_mean(x, jnp.zeros(4, bool))) == 0.0


def test_build_targets_center_cell():
    """A target at a cell center matches the expected cell + neighbor offsets."""
    # target: img 0, cls 2, centered at (0.55, 0.30) of the image, size 0.1
    targets = jnp.array([[0, 2, 0.55, 0.30, 0.10, 0.10]], jnp.float32)
    valid = jnp.array([True])
    anchors = jnp.array([[1.0, 1.0], [2.0, 2.0], [4.0, 4.0]])
    gh = gw = 16
    asg = build_targets_level(targets, valid, anchors, (gh, gw))

    m = np.asarray(asg["mask"])
    assert m.sum() > 0
    gi = np.asarray(asg["gi"])[m]
    gj = np.asarray(asg["gj"])[m]
    cls = np.asarray(asg["cls"])[m]
    # grid coords: x=8.8, y=4.8 -> main cell (8, 4)
    assert (8 in gi) and (4 in gj)
    assert np.all(cls == 2)
    # anchor-ratio filter: target wh in grid units = 1.6;
    # r vs anchors: 1.6, 0.8, 0.4 -> all pass ratio<4 -> 3 anchors
    # offsets: x%1=0.8>=0.5 -> no left; inverse x -> right eligible;
    # y%1=0.8 -> no up; inverse y -> down eligible => 3 offsets
    assert m.sum() == 9  # 3 anchors x 3 offsets (center, right-ish, down-ish)
    # tbox dxy within (-0.5, 1.5)
    tb = np.asarray(asg["tbox"])[m]
    assert np.all(tb[:, :2] > -0.5) and np.all(tb[:, :2] < 1.5)
    np.testing.assert_allclose(tb[:, 2:], 1.6, atol=1e-5)


def test_build_targets_anchor_filter():
    """A huge target is filtered for tiny anchors."""
    targets = jnp.array([[0, 0, 0.5, 0.5, 0.9, 0.9]], jnp.float32)
    valid = jnp.array([True])
    anchors = jnp.array([[1.0, 1.0]])  # grid wh = 14.4 -> ratio 14.4 > 4
    asg = build_targets_level(targets, valid, anchors, (16, 16))
    assert np.asarray(asg["mask"]).sum() == 0


def make_preds(nc=5, B=2, sizes=((8, 8), (4, 4), (2, 2)), na=3, seed=0):
    k = jax.random.PRNGKey(seed)
    preds = []
    for (h, w) in sizes:
        k, sub = jax.random.split(k)
        preds.append(jax.random.normal(sub, (B, h, w, na, nc + 5)) * 0.01)
    return preds


def test_compute_loss_runs_and_is_finite():
    anchors = jnp.asarray(DEFAULT_ANCHORS)
    loss_fn = ComputeLoss(anchors, num_classes=5)
    preds = make_preds()
    targets = jnp.array(
        [
            [0, 1, 0.5, 0.5, 0.2, 0.3],
            [1, 3, 0.25, 0.75, 0.1, 0.1],
            [0, 0, 0, 0, 0, 0],  # padding
        ],
        jnp.float32,
    )
    mask = jnp.array([True, True, False])
    total, aux = loss_fn(preds, targets, mask)
    assert np.isfinite(float(total))
    assert aux.shape == (3,)
    assert float(total) > 0
    # padding must not change the loss
    targets2 = targets.at[2].set(jnp.array([1, 4, 0.9, 0.9, 0.5, 0.5]))
    total2, _ = loss_fn(preds, targets2, mask)
    np.testing.assert_allclose(float(total), float(total2), rtol=1e-6)


def test_compute_loss_empty_targets():
    anchors = jnp.asarray(DEFAULT_ANCHORS)
    loss_fn = ComputeLoss(anchors, num_classes=5)
    preds = make_preds()
    targets = jnp.zeros((4, 6), jnp.float32)
    mask = jnp.zeros((4,), bool)
    total, aux = loss_fn(preds, targets, mask)
    assert np.isfinite(float(total))
    assert float(aux[0]) == 0.0 and float(aux[2]) == 0.0  # no box/cls loss
    assert float(aux[1]) > 0  # obj loss pushes background down


@pytest.mark.slow
def test_compute_loss_gradients_flow_and_reduce_loss():
    """One SGD step on the raw prediction tensors must reduce the loss (jitted)."""
    anchors = jnp.asarray(DEFAULT_ANCHORS)
    loss_fn = ComputeLoss(anchors, num_classes=3)
    preds = make_preds(nc=3, B=1, seed=2)
    targets = jnp.array([[0, 1, 0.5, 0.5, 0.25, 0.25]], jnp.float32)
    mask = jnp.array([True])

    @jax.jit
    def loss_of(ps):
        return loss_fn(ps, targets, mask)[0]

    g = jax.grad(loss_of)(preds)
    norm = sum(float(jnp.abs(x).sum()) for x in g)
    assert np.isfinite(norm) and norm > 0

    l0 = float(loss_of(preds))
    for _ in range(20):
        g = jax.jit(jax.grad(loss_of))(preds)
        preds = [p - 1.0 * gi for p, gi in zip(preds, g)]
    l1 = float(loss_of(preds))
    assert l1 < l0


def test_aerial_loss_runs():
    anchors = jnp.asarray(DEFAULT_ANCHORS)
    loss_fn = AerialDetectionLoss(anchors, num_classes=5)
    preds = make_preds()
    targets = jnp.array([[0, 1, 0.5, 0.5, 0.2, 0.3]], jnp.float32)
    mask = jnp.array([True])
    total, aux = loss_fn(preds, targets, mask)
    assert np.isfinite(float(total)) and float(total) > 0


def test_aerial_loss_gradients_flow():
    anchors = jnp.asarray(DEFAULT_ANCHORS)
    loss_fn = AerialDetectionLoss(anchors, num_classes=4)
    preds = make_preds(nc=4, B=1, seed=5)
    targets = jnp.array([[0, 2, 0.5, 0.5, 0.2, 0.2]], jnp.float32)
    mask = jnp.array([True])
    g = jax.grad(lambda ps: loss_fn(ps, targets, mask)[0])(preds)
    norm = sum(float(jnp.abs(x).sum()) for x in g)
    assert np.isfinite(norm) and norm > 0


def test_compute_loss_img_weight_excludes_padded_rows():
    """img_weight=0 on wrap-around duplicate rows must give EXACTLY the loss of
    the valid-only sub-batch (the loader's fixed-shape padding then contributes
    no gradient — ADVICE round 2)."""
    anchors = jnp.asarray(DEFAULT_ANCHORS)
    loss_fn = ComputeLoss(anchors, num_classes=5)
    preds_full = make_preds(nc=5, B=4, seed=11)
    # rows 3 is a duplicate of row 0 (like BatchLoader wrap-around padding)
    preds_full = [p.at[3].set(p[0]) for p in preds_full]
    preds_sub = [p[:3] for p in preds_full]

    t = jnp.array(
        [
            [0, 1, 0.5, 0.5, 0.2, 0.3],
            [1, 2, 0.25, 0.75, 0.1, 0.1],
            [2, 0, 0.6, 0.4, 0.3, 0.2],
            [3, 1, 0.5, 0.5, 0.2, 0.3],  # duplicate of row-0 target on dupe image
        ],
        jnp.float32,
    )
    mask = jnp.ones((4,), bool)
    iw = jnp.array([1.0, 1.0, 1.0, 0.0])

    total_w, aux_w = loss_fn(preds_full, t, mask, img_weight=iw)
    total_sub, aux_sub = loss_fn(preds_sub, t[:3], mask[:3])
    np.testing.assert_allclose(float(total_w), float(total_sub), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(aux_w), np.asarray(aux_sub), rtol=1e-5)


def test_compute_loss_img_weight_none_matches_unweighted():
    anchors = jnp.asarray(DEFAULT_ANCHORS)
    loss_fn = ComputeLoss(anchors, num_classes=5)
    preds = make_preds(nc=5, B=2, seed=13)
    t = jnp.array([[0, 1, 0.5, 0.5, 0.2, 0.3]], jnp.float32)
    mask = jnp.ones((1,), bool)
    base, _ = loss_fn(preds, t, mask)
    ones, _ = loss_fn(preds, t, mask, img_weight=jnp.ones((2,)))
    np.testing.assert_allclose(float(base), float(ones), rtol=1e-6)
