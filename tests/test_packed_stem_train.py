"""Equivalence of the train-mode packed stem (ops/packed_stem_train.py).

The packed-train stem must be a PURE layout choice: identical param/stat
trees, identical outputs, identical batch-stat updates, identical gradients
(up to float reassociation) vs the canonical FocusBlock+ConvBlock path.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from skyeye_tpu.config import ModelConfig
from skyeye_tpu.models import SkyEyeDetectorModule
from skyeye_tpu.ops.packed_stem import s2d4_host


def _trees_allclose(a, b, atol, rel_of_max=0.0):
    """Per-leaf |a-b| <= atol + rel_of_max * max|b| (reassociation noise in
    f32 reductions scales with the leaf's magnitude; exactness to 4e-13 is
    proven in float64 — see the module history / packed_stem_train docstring)."""
    flat_a = jax.tree_util.tree_leaves_with_path(a)
    flat_b = {jax.tree_util.keystr(p): v
              for p, v in jax.tree_util.tree_leaves_with_path(b)}
    assert len(flat_a) == len(flat_b)
    for path, va in flat_a:
        vb = np.asarray(flat_b[jax.tree_util.keystr(path)], np.float32)
        tol = atol + rel_of_max * float(np.max(np.abs(vb)))
        np.testing.assert_allclose(
            np.asarray(va, np.float32), vb,
            atol=tol, rtol=0, err_msg=jax.tree_util.keystr(path))


@pytest.fixture(scope="module")
def modules():
    cfg = ModelConfig.from_variant("s", nc=8)
    canon = SkyEyeDetectorModule(config=cfg, dtype=jnp.float32)
    packed = SkyEyeDetectorModule(config=cfg, dtype=jnp.float32,
                                  packed_stem_train=True)
    x = jax.random.uniform(jax.random.PRNGKey(3), (2, 128, 128, 3))
    variables = canon.init(jax.random.PRNGKey(0), x[:1], train=True)
    return canon, packed, variables, x


def test_param_trees_identical(modules):
    canon, packed, variables, x = modules
    v2 = packed.init(jax.random.PRNGKey(0), x[:1], train=True)
    p1 = {jax.tree_util.keystr(p): v.shape
          for p, v in jax.tree_util.tree_leaves_with_path(variables)}
    p2 = {jax.tree_util.keystr(p): v.shape
          for p, v in jax.tree_util.tree_leaves_with_path(v2)}
    assert p1 == p2


def test_eval_forward_matches(modules):
    canon, packed, variables, x = modules
    ref = canon.apply(variables, x, train=False)
    got = packed.apply(variables, x, train=False)
    for r, g in zip(ref, got):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r), atol=2e-4)


def test_packed_input_matches_raw(modules):
    _, packed, variables, x = modules
    ref = packed.apply(variables, x, train=False)
    got = packed.apply(variables,
                       jnp.asarray(s2d4_host(np.asarray(x))), train=False)
    for r, g in zip(ref, got):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r), atol=1e-5)


def test_train_forward_and_batch_stats_match(modules):
    canon, packed, variables, x = modules
    ref, ref_mut = canon.apply(variables, x, train=True,
                               mutable=["batch_stats"])
    got, got_mut = packed.apply(variables, x, train=True,
                                mutable=["batch_stats"])
    for r, g in zip(ref, got):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r), atol=3e-4)
    # phase-pooled sums reassociate the reduction: f32 noise ~1e-5
    _trees_allclose(got_mut["batch_stats"], ref_mut["batch_stats"], atol=5e-5)


@pytest.mark.slow
def test_gradients_match(modules):
    canon, packed, variables, x = modules

    def loss(mod, params):
        outs, _ = mod.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            x, train=True, mutable=["batch_stats"])
        return sum(jnp.mean(jnp.square(o)) for o in outs)

    g_ref = jax.grad(lambda p: loss(canon, p))(variables["params"])
    g_got = jax.grad(lambda p: loss(packed, p))(variables["params"])
    # equivalence is exact (max|diff| 4e-13 in float64); in f32 the grads are
    # sums over ~1e5 positions whose accumulation order differs, so noise
    # scales with leaf magnitude
    for name in ("stem", "down1"):
        _trees_allclose(g_got["backbone"][name], g_ref["backbone"][name],
                        atol=1e-5, rel_of_max=2e-3)
    _trees_allclose(g_got, g_ref, atol=1e-4, rel_of_max=2e-3)


def test_dense_remap_matches_gather_reference():
    """The shipped pad/reshape/transpose kernel remap must equal the gather
    reference (_remap over the derived index maps) bit-for-bit — it is the
    same permutation, just expressed without TPU-serialized gathers."""
    from skyeye_tpu.ops.packed_stem_train import (
        _down1_gather_indices,
        _remap,
        _stem_gather_indices,
        pack_down1_kernel_dense,
        pack_stem_kernel_dense,
    )

    key = jax.random.PRNGKey(11)
    k_stem = jax.random.normal(key, (6, 6, 3, 48))
    ref = _remap(k_stem, _stem_gather_indices(3, 48))
    got = pack_stem_kernel_dense(k_stem)
    assert got.shape == ref.shape == (3, 3, 48, 192)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))

    k_d1 = jax.random.normal(jax.random.PRNGKey(12), (3, 3, 48, 96))
    ref = _remap(k_d1, _down1_gather_indices(48, 96))
    got = pack_down1_kernel_dense(k_d1)
    assert got.shape == ref.shape == (2, 2, 192, 96)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))
