"""Packed-domain stage-1 equivalence tests (ops/packed_csp.py).

The packed stage must reproduce the canonical csp1+down2 exactly (weight
remaps are permutations/block-placements, not approximations); tolerances
below cover only f32 summation-order noise.
"""
import numpy as np
import jax
import jax.numpy as jnp

from skyeye_tpu.config import ModelConfig
from skyeye_tpu.models import SkyEyeDetectorModule
from skyeye_tpu.ops.packed_csp import (
    PackedStage1, pack_1x1_kernel, pack_3x3_kernel, pack_stage1_variables,
    s2d2_device,
)
from skyeye_tpu.ops.packed_stem import pack_stem_variables, s2d4_host
from skyeye_tpu.utils.checkpoint import fuse_conv_bn


def _randomized_variables(module, x, seed=0):
    variables = module.init(jax.random.PRNGKey(seed), x, train=False)
    leaves, treedef = jax.tree_util.tree_flatten(variables)
    keys = jax.random.split(jax.random.PRNGKey(seed + 100), len(leaves))
    leaves = [
        l + 0.1 * jax.random.normal(k, jnp.shape(l)) if jnp.ndim(l) == 1 else l
        for l, k in zip(leaves, keys)
    ]
    variables = jax.tree_util.tree_unflatten(treedef, leaves)
    variables["batch_stats"] = jax.tree_util.tree_map(
        lambda v: jnp.abs(v) + 0.05, variables["batch_stats"]
    )
    return variables


def test_pack_1x1_kernel_matches_conv():
    rng = np.random.default_rng(0)
    k = rng.normal(size=(1, 1, 6, 4)).astype(np.float32)
    x = rng.normal(size=(1, 8, 8, 6)).astype(np.float32)
    ref = jax.lax.conv_general_dilated(
        x, k, (1, 1), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"))
    xp = s2d2_device(jnp.asarray(x))
    got = jax.lax.conv_general_dilated(
        np.asarray(xp), pack_1x1_kernel(k), (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    # unpack phase-major channels back to canonical layout
    B, Hp, Wp, _ = got.shape
    g = np.asarray(got).reshape(B, Hp, Wp, 2, 2, 4)
    g = np.moveaxis(g, 3, 2).reshape(B, Hp * 2, Wp * 2, 4)
    np.testing.assert_allclose(g, np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_pack_3x3_kernel_matches_conv():
    rng = np.random.default_rng(1)
    k = rng.normal(size=(3, 3, 5, 7)).astype(np.float32)
    x = rng.normal(size=(2, 12, 10, 5)).astype(np.float32)
    ref = jax.lax.conv_general_dilated(
        x, k, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    xp = s2d2_device(jnp.asarray(x))
    got = jax.lax.conv_general_dilated(
        np.asarray(xp), pack_3x3_kernel(k), (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    B, Hp, Wp, _ = got.shape
    g = np.asarray(got).reshape(B, Hp, Wp, 2, 2, 7)
    g = np.moveaxis(g, 3, 2).reshape(B, Hp * 2, Wp * 2, 7)
    np.testing.assert_allclose(g, np.asarray(ref), rtol=1e-4, atol=1e-4)


def test_packed_stage1_full_model_matches_canonical():
    """Full detector forward: packed_stage1 (+packed_stem) == canonical."""
    cfg = ModelConfig.from_variant("s", nc=5)
    rng = np.random.default_rng(2)
    img = rng.integers(0, 255, (2, 128, 128, 3)).astype(np.uint8)
    x = jnp.asarray(img, jnp.float32) / 255.0

    canonical = SkyEyeDetectorModule(config=cfg)
    variables = _randomized_variables(canonical, x, seed=7)
    ref = canonical.apply(variables, x, train=False)

    packed = SkyEyeDetectorModule(config=cfg, packed_stem=True,
                                  packed_stage1=True)
    pvars = pack_stage1_variables(pack_stem_variables(variables, down1_p2p=True))
    xp = jnp.asarray(s2d4_host(img), jnp.float32) / 255.0
    got = packed.apply(pvars, xp, train=False)
    for r, g in zip(ref, got):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                   rtol=1e-4, atol=3e-5)


def test_packed_stage1_after_bn_fold():
    """Serving order: fuse_conv_bn -> pack_stem -> pack_stage1 stays exact."""
    cfg = ModelConfig.from_variant("s", nc=3)
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.integers(0, 255, (1, 64, 64, 3)), jnp.float32) / 255.0

    canonical = SkyEyeDetectorModule(config=cfg)
    variables = _randomized_variables(canonical, x, seed=11)
    fused = fuse_conv_bn(variables)
    ref = canonical.apply(fused, x, train=False)

    packed = SkyEyeDetectorModule(config=cfg, packed_stem=True,
                                  packed_stage1=True)
    got = packed.apply(pack_stage1_variables(pack_stem_variables(fused, down1_p2p=True)), x,
                       train=False)
    for r, g in zip(ref, got):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                   rtol=1e-4, atol=3e-5)


def test_packed_stage1_multi_block_variant():
    """depth_multiple=1.0 exercises num_blocks=3 (m0..m2 remaps)."""
    cfg = ModelConfig.from_variant("s", nc=2)
    cfg = type(cfg)(**{**cfg.__dict__, "depth_multiple": 1.0})
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.integers(0, 255, (1, 64, 64, 3)), jnp.float32) / 255.0

    canonical = SkyEyeDetectorModule(config=cfg)
    variables = _randomized_variables(canonical, x, seed=13)
    ref = canonical.apply(variables, x, train=False)

    packed = SkyEyeDetectorModule(config=cfg, packed_stem=True,
                                  packed_stage1=True)
    got = packed.apply(pack_stage1_variables(pack_stem_variables(variables, down1_p2p=True)),
                       x, train=False)
    for r, g in zip(ref, got):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                   rtol=1e-4, atol=3e-5)


def test_packed_m_csp_full_model_matches_canonical():
    """Full detector forward: W-pair packed bottleneck chains == canonical.

    Exercises the full serving remap stack (fuse_conv_bn -> merged cv12 ->
    pack_csp_m_variables) at a geometry where csp2/fpn3 have hidden < 128
    so the W-paired branch actually engages."""
    from skyeye_tpu.ops.merged_csp import merge_csp_cv12_variables
    from skyeye_tpu.ops.packed_csp import pack_csp_m_variables

    cfg = ModelConfig.from_variant("s", nc=5)
    rng = np.random.default_rng(6)
    x = jnp.asarray(rng.integers(0, 255, (2, 128, 128, 3)), jnp.float32) / 255.0

    canonical = SkyEyeDetectorModule(config=cfg)
    variables = _randomized_variables(canonical, x, seed=9)
    fused = fuse_conv_bn(variables)
    ref = canonical.apply(fused, x, train=False)

    mod = SkyEyeDetectorModule(config=cfg, merged_csp=True, packed_m_csp=True)
    pvars = pack_csp_m_variables(merge_csp_cv12_variables(fused))
    got = mod.apply(pvars, x, train=False)
    for r, g in zip(ref, got):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                   rtol=1e-4, atol=3e-5)


def test_packed_m_csp_raw_bn_variables():
    """pack_csp_m_variables also works pre-BN-fold (tiles batch_stats)."""
    from skyeye_tpu.ops.packed_csp import pack_csp_m_variables

    cfg = ModelConfig.from_variant("s", nc=2)
    rng = np.random.default_rng(8)
    x = jnp.asarray(rng.integers(0, 255, (1, 64, 64, 3)), jnp.float32) / 255.0

    canonical = SkyEyeDetectorModule(config=cfg)
    variables = _randomized_variables(canonical, x, seed=13)
    ref = canonical.apply(variables, x, train=False)

    mod = SkyEyeDetectorModule(config=cfg, packed_m_csp=True)
    got = mod.apply(pack_csp_m_variables(variables), x, train=False)
    for r, g in zip(ref, got):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                   rtol=1e-4, atol=3e-5)
