"""Packed-s2d stem equivalence tests (ops/packed_stem.py)."""
import numpy as np
import jax
import jax.numpy as jnp

from skyeye_tpu.config import ModelConfig
from skyeye_tpu.models import SkyEyeDetectorModule
from skyeye_tpu.ops.packed_stem import (
    pack_stem_variables, s2d4_device, s2d4_host,
)
from skyeye_tpu.utils.checkpoint import fuse_conv_bn


def test_s2d4_host_device_agree():
    rng = np.random.default_rng(0)
    x = rng.integers(0, 255, (2, 32, 32, 3)).astype(np.uint8)
    h = s2d4_host(x)
    d = np.asarray(s2d4_device(jnp.asarray(x)))
    assert h.shape == (2, 8, 8, 48)
    np.testing.assert_array_equal(h, d)


def test_packed_stem_matches_canonical_full_model():
    """Full detector forward: packed_stem module + pack_stem_variables == canonical
    module on the same image, to f32 numerical noise."""
    cfg = ModelConfig.from_variant("s", nc=5)
    rng = np.random.default_rng(1)
    img = rng.integers(0, 255, (2, 128, 128, 3)).astype(np.uint8)
    x = jnp.asarray(img, jnp.float32) / 255.0

    canonical = SkyEyeDetectorModule(config=cfg)
    variables = canonical.init(jax.random.PRNGKey(0), x, train=False)
    # randomize every BN leaf (scale/bias/mean/var) so the 4x tiling of the stem's
    # BN parameters is actually exercised (init values are the trivial 1/0/0/1)
    leaves, treedef = jax.tree_util.tree_flatten(variables)
    keys = jax.random.split(jax.random.PRNGKey(42), len(leaves))
    leaves = [
        l + 0.1 * jax.random.normal(k, jnp.shape(l)) if jnp.ndim(l) == 1 else l
        for l, k in zip(leaves, keys)
    ]
    variables = jax.tree_util.tree_unflatten(treedef, leaves)
    variables["batch_stats"] = jax.tree_util.tree_map(
        lambda v: jnp.abs(v) + 0.05, variables["batch_stats"]
    )
    ref = canonical.apply(variables, x, train=False)

    packed = SkyEyeDetectorModule(config=cfg, packed_stem=True)
    pvars = pack_stem_variables(variables)
    xp = jnp.asarray(s2d4_host(img), jnp.float32) / 255.0
    got = packed.apply(pvars, xp, train=False)
    got_dev = packed.apply(pvars, x, train=False)  # device-side packing path

    for r, g, gd in zip(ref, got, got_dev):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r), rtol=1e-4, atol=2e-5)
        np.testing.assert_allclose(np.asarray(gd), np.asarray(r), rtol=1e-4, atol=2e-5)


def test_packed_stem_matches_after_bn_fold():
    """Serving order: fuse_conv_bn then pack_stem_variables stays exact."""
    cfg = ModelConfig.from_variant("s", nc=3)
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.integers(0, 255, (1, 64, 64, 3)), jnp.float32) / 255.0

    canonical = SkyEyeDetectorModule(config=cfg)
    variables = canonical.init(jax.random.PRNGKey(3), x, train=False)
    fused = fuse_conv_bn(variables)
    ref = canonical.apply(fused, x, train=False)

    packed = SkyEyeDetectorModule(config=cfg, packed_stem=True)
    got = packed.apply(pack_stem_variables(fused), x, train=False)
    for r, g in zip(ref, got):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r), rtol=1e-4, atol=2e-5)


def test_fold_input_scale_matches_divide():
    """conv(x/255, k) == conv(x, k/255): folding the input normalization into
    the stem kernel must reproduce the canonical forward exactly (f32), so the
    serving pipeline can feed raw 0..255 frames with no normalize pass."""
    from skyeye_tpu.ops.packed_stem import fold_input_scale

    cfg = ModelConfig.from_variant("s", nc=3)
    rng = np.random.default_rng(5)
    img = rng.integers(0, 255, (1, 64, 64, 3)).astype(np.uint8)

    canonical = SkyEyeDetectorModule(config=cfg)
    variables = canonical.init(
        jax.random.PRNGKey(4), jnp.zeros((1, 64, 64, 3)), train=False)
    fused = fuse_conv_bn(variables)
    ref = canonical.apply(fused, jnp.asarray(img, jnp.float32) / 255.0,
                          train=False)
    got = canonical.apply(fold_input_scale(fused),
                          jnp.asarray(img, jnp.float32), train=False)
    for r, g in zip(ref, got):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                   rtol=2e-5, atol=2e-6)


def test_pack_down1_p2p_kernel_matches_conv():
    """Packed-in/packed-out down1 == canonical 3x3/2 conv (exact remap)."""
    import jax
    import jax.numpy as jnp
    from skyeye_tpu.ops.packed_csp import s2d2_device
    from skyeye_tpu.ops.packed_stem import pack_down1_p2p_kernel

    rng = np.random.default_rng(5)
    k = rng.normal(size=(3, 3, 6, 5)).astype(np.float32)
    x = rng.normal(size=(2, 16, 12, 6)).astype(np.float32)
    ref = jax.lax.conv_general_dilated(
        x, k, (2, 2), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))  # (2, 8, 6, 5) canonical
    xp = np.asarray(s2d2_device(jnp.asarray(x)))     # (2, 8, 6, 24) packed in
    got = jax.lax.conv_general_dilated(
        xp, pack_down1_p2p_kernel(k), (2, 2), [(1, 0), (1, 0)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))  # (2, 4, 3, 20) packed out
    B, Hp, Wp, _ = got.shape
    g = np.asarray(got).reshape(B, Hp, Wp, 2, 2, 5)
    g = np.moveaxis(g, 3, 2).reshape(B, Hp * 2, Wp * 2, 5)
    np.testing.assert_allclose(g, np.asarray(ref), rtol=1e-4, atol=1e-4)
