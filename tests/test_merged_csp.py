"""Merged CSP split-conv equivalence tests (ops/merged_csp.py).

The merged layout computes each CSP's cv1+cv2 as one conv (one HBM read of
the shared input); these tests pin exact numerical equivalence against the
canonical layout for eval, train, and the full serving transform chain.
"""
import jax
import jax.numpy as jnp
import numpy as np

from skyeye_tpu.config import ModelConfig
from skyeye_tpu.models import SkyEyeDetectorModule
from skyeye_tpu.ops.merged_csp import merge_csp_cv12_variables


def _randomized_variables(module, x, seed=42):
    variables = module.init(jax.random.PRNGKey(0), x, train=False)
    # randomize BN leaves so the concat of (scale, bias, mean, var) is exercised
    leaves, treedef = jax.tree_util.tree_flatten(variables)
    keys = jax.random.split(jax.random.PRNGKey(seed), len(leaves))
    leaves = [
        l + 0.1 * jax.random.normal(k, jnp.shape(l)) if jnp.ndim(l) == 1 else l
        for l, k in zip(leaves, keys)
    ]
    variables = jax.tree_util.tree_unflatten(treedef, leaves)
    variables["batch_stats"] = jax.tree_util.tree_map(
        lambda v: jnp.abs(v) + 0.05, variables["batch_stats"]
    )
    return variables


def test_merged_csp_matches_canonical_eval():
    cfg = ModelConfig.from_variant("s", nc=5)
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.uniform(0, 1, (2, 128, 128, 3)), jnp.float32)

    canonical = SkyEyeDetectorModule(config=cfg)
    variables = _randomized_variables(canonical, x)
    ref = canonical.apply(variables, x, train=False)

    merged = SkyEyeDetectorModule(config=cfg, merged_csp=True)
    mvars = merge_csp_cv12_variables(variables)
    got = merged.apply(mvars, x, train=False)

    for r, g in zip(ref, got):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r), rtol=1e-5, atol=1e-6)


def test_merged_csp_matches_canonical_train_and_stats():
    """Train mode: identical outputs AND identical updated running stats
    (merged stats are the concat of the branch stats)."""
    cfg = ModelConfig.from_variant("s", nc=3)
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.uniform(0, 1, (2, 64, 64, 3)), jnp.float32)

    canonical = SkyEyeDetectorModule(config=cfg)
    variables = _randomized_variables(canonical, x, seed=7)
    ref, ref_mut = canonical.apply(variables, x, train=True,
                                   mutable=["batch_stats"])

    merged = SkyEyeDetectorModule(config=cfg, merged_csp=True)
    mvars = merge_csp_cv12_variables(variables)
    got, got_mut = merged.apply(mvars, x, train=True, mutable=["batch_stats"])

    # train mode computes BN batch statistics over the merged 2h-channel tensor
    # in one reduction — same math, different float summation order than two
    # h-channel reductions (measured max-abs 8e-6 on this geometry)
    for r, g in zip(ref, got):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r), rtol=1e-3, atol=3e-4)

    # the merged module's updated stats must equal the remap of the canonical
    # module's updated stats
    want = merge_csp_cv12_variables({"batch_stats": ref_mut["batch_stats"]})
    flat_want = jax.tree_util.tree_leaves_with_path(want["batch_stats"])
    flat_got = dict(jax.tree_util.tree_leaves_with_path(got_mut["batch_stats"]))
    assert len(flat_want) == len(flat_got)
    for path, leaf in flat_want:
        np.testing.assert_allclose(
            np.asarray(flat_got[path]), np.asarray(leaf), rtol=1e-3, atol=3e-4
        )


def test_merged_csp_serving_chain():
    """The bench serving order — fuse_conv_bn -> pack_stem -> pack_stage1 ->
    merge — stays equivalent to the canonical model."""
    from skyeye_tpu.ops.packed_csp import pack_stage1_variables
    from skyeye_tpu.ops.packed_stem import pack_stem_variables, s2d4_host
    from skyeye_tpu.utils.checkpoint import fuse_conv_bn

    cfg = ModelConfig.from_variant("s", nc=5)
    rng = np.random.default_rng(5)
    img = rng.integers(0, 255, (2, 128, 128, 3)).astype(np.uint8)
    x = jnp.asarray(img, jnp.float32) / 255.0

    canonical = SkyEyeDetectorModule(config=cfg)
    variables = _randomized_variables(canonical, x, seed=11)
    ref = canonical.apply(variables, x, train=False)

    serving = SkyEyeDetectorModule(config=cfg, packed_stem=True,
                                   packed_stage1=True, merged_csp=True)
    svars = merge_csp_cv12_variables(
        pack_stage1_variables(
            pack_stem_variables(fuse_conv_bn(variables), down1_p2p=True)))
    xp = jnp.asarray(s2d4_host(img), jnp.float32) / 255.0
    got = serving.apply(svars, xp, train=False)

    for r, g in zip(ref, got):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r), rtol=2e-4, atol=2e-4)
