"""Shape/semantics tests for blocks, attention, backbone, neck, head, detector."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from skyeye_tpu.config import ModelConfig
from skyeye_tpu.models import (
    CBAM,
    ConvBlock,
    CSPBlock,
    CrossLayerAttention,
    DetectionHead,
    FeatureNeck,
    FocusBlock,
    SPPBlock,
    SkyEyeDetectorModule,
    TransformerLayer,
    WindowedSelfAttention,
    create_detector,
    decode_predictions,
    feature_channels,
    space_to_depth_2x2,
)

KEY = jax.random.PRNGKey(0)


def init_apply(module, x, **kw):
    variables = module.init(KEY, x, **kw)
    return module.apply(variables, x, **kw)


def test_conv_block_shapes():
    x = jnp.ones((2, 32, 32, 16))
    out = init_apply(ConvBlock(out_channels=32, kernel_size=3, stride=2), x)
    assert out.shape == (2, 16, 16, 32)
    out = init_apply(ConvBlock(out_channels=8, kernel_size=1), x)
    assert out.shape == (2, 32, 32, 8)


def test_focus_space_to_depth():
    # Focus halves spatial dims and quadruples channels before conv
    # (reference blocks.py:170-182)
    x = jnp.arange(2 * 8 * 8 * 3, dtype=jnp.float32).reshape(2, 8, 8, 3)
    s2d = space_to_depth_2x2(x)
    assert s2d.shape == (2, 4, 4, 12)
    # patch order: TL, BL, TR, BR
    np.testing.assert_array_equal(np.asarray(s2d[0, 0, 0, :3]), np.asarray(x[0, 0, 0]))
    np.testing.assert_array_equal(np.asarray(s2d[0, 0, 0, 3:6]), np.asarray(x[0, 1, 0]))
    np.testing.assert_array_equal(np.asarray(s2d[0, 0, 0, 6:9]), np.asarray(x[0, 0, 1]))
    np.testing.assert_array_equal(np.asarray(s2d[0, 0, 0, 9:12]), np.asarray(x[0, 1, 1]))
    out = init_apply(FocusBlock(out_channels=16, kernel_size=3), x)
    assert out.shape == (2, 4, 4, 16)


def test_csp_spp_shapes():
    x = jnp.ones((1, 16, 16, 64))
    assert init_apply(CSPBlock(out_channels=64, num_blocks=2), x).shape == (1, 16, 16, 64)
    assert init_apply(SPPBlock(out_channels=128), x).shape == (1, 16, 16, 128)


def test_cbam_preserves_shape_and_gates():
    x = jax.random.normal(KEY, (2, 8, 8, 32))
    out = init_apply(CBAM(), x)
    assert out.shape == x.shape


def test_spatial_attention_shiftadd_matches_conv(monkeypatch):
    """SKYEYE_SPATTN_SHIFTADD=1 (VPU shift-add instead of the 2-in/1-out-lane
    conv XLA runs at ~0.5% of floor) is the same math: same param tree, same
    output up to f32 summation order (98 products re-associated); bf16 within
    one rounding step of the conv's f32-accumulated result."""
    from skyeye_tpu.models.attention import SpatialAttention

    x32 = jax.random.normal(KEY, (2, 16, 16, 32), jnp.float32)
    for dtype, tol in ((jnp.float32, 1e-5), (jnp.bfloat16, 2e-2)):
        mod = SpatialAttention(dtype=dtype)
        x = x32.astype(dtype)
        monkeypatch.delenv("SKYEYE_SPATTN_SHIFTADD", raising=False)
        variables = mod.init(KEY, x)
        ref = mod.apply(variables, x)
        monkeypatch.setenv("SKYEYE_SPATTN_SHIFTADD", "1")
        # identical param tree: the shift-add path must consume conv weights
        v2 = mod.init(KEY, x)
        assert jax.tree.structure(v2) == jax.tree.structure(variables)
        assert v2["params"]["conv"]["kernel"].shape == (7, 7, 2, 1)
        out = mod.apply(variables, x)
        diff = float(jnp.max(jnp.abs(out.astype(jnp.float32)
                                     - ref.astype(jnp.float32))))
        assert diff <= tol, (dtype, diff)
    monkeypatch.delenv("SKYEYE_SPATTN_SHIFTADD", raising=False)


def test_cross_layer_attention():
    q = jax.random.normal(KEY, (2, 16, 16, 64))
    k = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 8, 128))
    m = CrossLayerAttention(query_channels=64, key_channels=128, region_size=2, heads=4)
    variables = m.init(KEY, q, k)
    out = m.apply(variables, q, k)
    assert out.shape == (2, 16, 16, 64)


def test_transformer_layer():
    x = jax.random.normal(KEY, (2, 8, 8, 64))
    out = init_apply(TransformerLayer(num_heads=4), x)
    assert out.shape == x.shape


def test_windowed_attention():
    ws, C = 4, 32
    x = jax.random.normal(KEY, (6, ws * ws, C))  # B*num_windows tokens
    m = WindowedSelfAttention(dim=C, window_size=ws, num_heads=4)
    variables = m.init(KEY, x)
    out = m.apply(variables, x)
    assert out.shape == x.shape
    # with shift mask
    mask = jnp.zeros((3, ws * ws, ws * ws))
    out = m.apply(variables, x, mask)
    assert out.shape == x.shape


@pytest.mark.parametrize(
    "variant,width",
    [("s", 0.5), pytest.param("m", 0.75, marks=pytest.mark.slow)],
)
def test_detector_feature_shapes(variant, width):
    cfg = ModelConfig.from_variant(variant, nc=10)
    module = SkyEyeDetectorModule(config=cfg)
    x = jnp.zeros((1, 128, 128, 3))
    variables = module.init(KEY, x, train=False)
    outs = module.apply(variables, x, train=False)
    chans = feature_channels(cfg.base_channels, cfg.width_multiple)
    assert len(outs) == 3
    for out, stride in zip(outs, (8, 16, 32)):
        B, H, W, na, no = out.shape
        assert (H, W) == (128 // stride, 128 // stride)
        assert na == 3 and no == 15


def test_decode_formula_fixed_vector():
    """Hand-computed decode check (reference detector.py:137-138)."""
    nc = 2
    B, H, W, na = 1, 2, 2, 1
    raw = np.zeros((B, H, W, na, 5 + nc), np.float32)
    # logit 0 -> sigmoid 0.5 everywhere
    anchors = np.array([[[2.0, 3.0]]])  # 1 level, 1 anchor, grid units
    out = decode_predictions([jnp.asarray(raw)], anchors, (64, 64))
    out = np.asarray(out)  # (1, 4, 7)
    stride = 32.0  # 64/2
    # sigmoid(0)=0.5: xy = (2*0.5 - 0.5 + grid)*stride = (0.5+grid)*32
    # wh = (2*0.5)^2 * anchor * stride = anchor*32
    # flatten order is anchor-major then row-major over (H, W)
    exp_xy = np.array([[0.5, 0.5], [1.5, 0.5], [0.5, 1.5], [1.5, 1.5]]) * stride
    np.testing.assert_allclose(out[0, :, :2], exp_xy, rtol=1e-5)
    np.testing.assert_allclose(out[0, :, 2], 2.0 * stride * np.ones(4), rtol=1e-5)
    np.testing.assert_allclose(out[0, :, 3], 3.0 * stride * np.ones(4), rtol=1e-5)
    np.testing.assert_allclose(out[0, :, 4:], 0.5 * np.ones((4, 3)), rtol=1e-5)


def test_create_detector_and_decode_pipeline():
    module, variables = create_detector("skyeye_s", num_classes=5)
    x = jnp.zeros((1, 64, 64, 3))
    outs = module.apply(variables, x, train=False)
    dec = module.decode(outs, (64, 64))
    n = sum(3 * (64 // s) ** 2 for s in (8, 16, 32))
    assert dec.shape == (1, n, 10)
    # decoded xy within input bounds (+/- half stride), wh positive
    dec = np.asarray(dec)
    assert np.all(dec[..., 2:4] > 0)
    assert np.all(dec[..., 4:] >= 0) and np.all(dec[..., 4:] <= 1)


def test_enhanced_detector():
    cfg = ModelConfig.from_variant("s", nc=4)
    import dataclasses

    cfg = dataclasses.replace(cfg, enhanced=True)
    module = SkyEyeDetectorModule(config=cfg)
    x = jnp.zeros((1, 64, 64, 3))
    variables = module.init(KEY, x, train=False)
    outs = module.apply(variables, x, train=False)
    assert len(outs) == 3
    assert "cross_attn_p5_p4" in variables["params"]


def test_transformer_heads_detector():
    cfg = ModelConfig.from_variant("s", nc=4)
    import dataclasses

    cfg = dataclasses.replace(cfg, transformer_heads=True)
    module = SkyEyeDetectorModule(config=cfg)
    x = jnp.zeros((1, 64, 64, 3))
    variables = module.init(KEY, x, train=False)
    outs = module.apply(variables, x, train=False)
    assert len(outs) == 3


def test_batchnorm_train_mode_updates_stats():
    x = jax.random.normal(KEY, (4, 16, 16, 8)) * 3 + 1
    m = ConvBlock(out_channels=8, kernel_size=3)
    variables = m.init(KEY, x, train=True)
    out, updates = m.apply(variables, x, train=True, mutable=["batch_stats"])
    before = variables["batch_stats"]["bn"]["mean"]
    after = updates["batch_stats"]["bn"]["mean"]
    assert not np.allclose(np.asarray(before), np.asarray(after))


def test_fused_focus_equals_s2d_conv():
    """The fused 2kx2k stride-2 stem is numerically identical to
    space-to-depth + kxk conv with mapped weights."""
    import flax.linen as nn
    from skyeye_tpu.models.blocks import FocusBlock, fused_stem_kernel, unfuse_stem_kernel

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(0, 1, (2, 16, 16, 3)).astype(np.float32))
    k3 = rng.normal(0, 0.2, (3, 3, 12, 8)).astype(np.float32)

    # manual s2d + conv3x3 (reference formulation)
    from skyeye_tpu.models.blocks import space_to_depth_2x2

    ref = jax.lax.conv_general_dilated(
        space_to_depth_2x2(x), jnp.asarray(k3), (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )

    # fused formulation through FocusBlock with the converted kernel
    m = FocusBlock(out_channels=8, kernel_size=3)
    variables = m.init(KEY, x, train=False)
    k6 = fused_stem_kernel(k3)
    assert k6.shape == (6, 6, 3, 8)
    variables = jax.tree_util.tree_map(lambda v: v, variables)
    params = dict(variables["params"])
    params["conv"] = {"kernel": jnp.asarray(k6)}
    # bypass BN/SiLU: compare raw conv outputs
    fused = jax.lax.conv_general_dilated(
        x, jnp.asarray(k6), (2, 2), ((2, 2), (2, 2)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    np.testing.assert_allclose(np.asarray(fused), np.asarray(ref), rtol=1e-4, atol=1e-5)

    # inverse round-trip
    np.testing.assert_array_equal(unfuse_stem_kernel(k6), k3)


def test_window_partition_roundtrip():
    from skyeye_tpu.models import window_partition, window_reverse

    x = jax.random.normal(KEY, (2, 16, 16, 8))
    wins = window_partition(x, 4)
    assert wins.shape == (2 * 16, 16, 8)
    back = window_reverse(wins, 4, 16, 16)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(x))


def test_swin_block_plain_and_shifted():
    from skyeye_tpu.models import SwinBlock

    x = jax.random.normal(KEY, (2, 16, 16, 32))
    for shift in (0, 2):
        m = SwinBlock(window_size=4, num_heads=4, shift=shift)
        variables = m.init(KEY, x)
        out = m.apply(variables, x)
        assert out.shape == x.shape
        assert np.isfinite(np.asarray(out)).all()


def test_shift_window_mask_blocks_cross_region():
    from skyeye_tpu.models import shift_window_mask

    mask = shift_window_mask(8, 8, 4, 2)
    assert mask.shape == (4, 16, 16)
    # some pairs masked, some not
    assert float(mask.min()) == -100.0 and float(mask.max()) == 0.0


def test_calibration_observe_ranges():
    """observe_ranges captures per-submodule activation stats on the detector."""
    import numpy as np

    from skyeye_tpu.config import ModelConfig
    from skyeye_tpu.models import SkyEyeDetectorModule
    from skyeye_tpu.ops.calibrate import (
        observe_ranges, quantize_weight_per_channel, symmetric_scale,
    )

    cfg = ModelConfig(nc=3, base_channels=16, depth_multiple=0.33,
                      width_multiple=0.25)
    module = SkyEyeDetectorModule(config=cfg)
    x0 = np.zeros((1, 64, 64, 3), np.float32)
    variables = module.init(jax.random.PRNGKey(0), jnp.asarray(x0), train=False)

    rng = np.random.default_rng(0)
    batches = [rng.uniform(0, 1, (2, 64, 64, 3)).astype(np.float32)
               for _ in range(2)]
    stats = observe_ranges(module, variables, batches)
    assert any("backbone" in k for k in stats)
    for v in stats.values():
        assert v["absmax"] >= v["pctl"] >= 0

    # weight quantization round-trip sanity
    k = rng.normal(0, 0.1, (3, 3, 8, 16)).astype(np.float32)
    q, s = quantize_weight_per_channel(k)
    err = np.abs(q.astype(np.float32) * s[None, None, None, :] - k).max()
    assert err < np.abs(k).max() / 100
    assert symmetric_scale(1.27) == 1.27 / 127


def test_decode_anchor_major_permutation_only():
    """anchor_major=False emits the same decoded rows as True, just permuted —
    serving pipelines skip the reference-order transpose."""
    import numpy as np

    from skyeye_tpu.models.head import decode_predictions

    rng = np.random.default_rng(0)
    outs = [jnp.asarray(rng.normal(0, 1, (2, 8, 8, 3, 10)).astype(np.float32)),
            jnp.asarray(rng.normal(0, 1, (2, 4, 4, 3, 10)).astype(np.float32))]
    anchors = jnp.asarray(rng.uniform(1, 4, (2, 3, 2)).astype(np.float32))
    a = np.asarray(decode_predictions(outs, anchors, (64, 64), anchor_major=True))
    b = np.asarray(decode_predictions(outs, anchors, (64, 64), anchor_major=False))
    assert a.shape == b.shape
    for i in range(2):
        sa = a[i][np.lexsort(a[i].T)]
        sb = b[i][np.lexsort(b[i].T)]
        np.testing.assert_allclose(sa, sb, rtol=1e-6)


def test_shiftmax_pool_equals_max_pool():
    """The sharded-path SPP pool (van Herk shift-max chain) is numerically
    identical to nn.max_pool stride-1 SAME for every SPP kernel size, including
    non-multiple-of-k and tiny maps."""
    import flax.linen as nn

    from skyeye_tpu.models.blocks import _maxpool_same_shiftmax

    rng = np.random.default_rng(3)
    for H, W in ((16, 16), (7, 9), (4, 4), (20, 12)):
        x = jnp.asarray(rng.normal(size=(2, H, W, 8)).astype(np.float32))
        for k in (3, 5, 9, 13):
            p = k // 2
            want = nn.max_pool(x, (k, k), strides=(1, 1),
                               padding=((p, p), (p, p)))
            got = _maxpool_same_shiftmax(x, k)
            np.testing.assert_array_equal(np.asarray(got), np.asarray(want),
                                          err_msg=f"k={k} H={H} W={W}")


@pytest.mark.slow
def test_spp_block_no_gather_under_spatial_mesh():
    """SPPBlock under a spatial mesh routes through the shift-max pools and
    produces the same forward output as the unsharded run."""
    from skyeye_tpu.models.blocks import SPPBlock

    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device CPU mesh")
    from skyeye_tpu.parallel import create_mesh

    mesh = create_mesh(n_spatial=4)
    m = SPPBlock(out_channels=32)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 8, 8, 16)),
                    jnp.float32)
    v = m.init(jax.random.PRNGKey(0), x)
    want = m.apply(v, x)

    from jax.sharding import NamedSharding, PartitionSpec as P

    xs = jax.device_put(x, NamedSharding(mesh, P("data", "spatial")))
    with jax.set_mesh(mesh):
        got = jax.jit(lambda v, x: m.apply(v, x))(v, xs)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-6)


@pytest.mark.slow
def test_spp_block_sharded_grads_match_unsharded():
    """Gradients through the sharded shift-max SPP must match the single-device
    run — this is exactly what XLA select-and-scatter (nn.max_pool's backward)
    gets wrong under row sharding (~90% error, see blocks._unshard_spatial);
    the select-chain backward must not."""
    from skyeye_tpu.models.blocks import SPPBlock

    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device CPU mesh")
    from jax.sharding import NamedSharding, PartitionSpec as P

    from skyeye_tpu.parallel import create_mesh

    m = SPPBlock(out_channels=32)
    x = jnp.asarray(np.random.default_rng(1).normal(size=(4, 8, 8, 16)),
                    jnp.float32)
    v = m.init(jax.random.PRNGKey(0), x)

    def loss(params, x):
        return jnp.sum(
            m.apply({"params": params, "batch_stats": v["batch_stats"]}, x) ** 2
        )

    g_ref, gx_ref = jax.grad(loss, argnums=(0, 1))(v["params"], x)

    for n_spatial in (2, 4):  # down to 2-row shards: hammer the halo path
        mesh = create_mesh(n_spatial=n_spatial)
        xs = jax.device_put(x, NamedSharding(mesh, P("data", "spatial")))
        with jax.set_mesh(mesh):
            g_sp, gx_sp = jax.jit(jax.grad(loss, argnums=(0, 1)))(v["params"], xs)
        np.testing.assert_allclose(np.asarray(gx_sp), np.asarray(gx_ref),
                                   rtol=1e-4, atol=1e-5,
                                   err_msg=f"input grads, spatial={n_spatial}")
        for a, b in zip(jax.tree_util.tree_leaves(g_sp),
                        jax.tree_util.tree_leaves(g_ref)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-5,
                                       err_msg=f"param grads, spatial={n_spatial}")


@pytest.mark.slow
@pytest.mark.parametrize("level", ["block", "stage"])
def test_remat_is_numerically_transparent(level):
    """remat (jax.checkpoint around CSP/SPP blocks or whole backbone stages +
    neck) must not change the param tree, the loss, the gradients, or the BN
    stat updates — only the backward-pass memory schedule."""
    cfg = ModelConfig(nc=8, base_channels=16, depth_multiple=0.33,
                      width_multiple=0.5)
    x = jnp.asarray(
        np.random.default_rng(0).uniform(0, 1, (2, 64, 64, 3)).astype(np.float32)
    )
    m0 = SkyEyeDetectorModule(config=cfg)
    m1 = SkyEyeDetectorModule(config=cfg, remat=level)
    v = m0.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), train=True)
    v1 = m1.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), train=True)
    assert jax.tree_util.tree_structure(v) == jax.tree_util.tree_structure(v1)

    def make_loss(m):
        def f(p):
            o, upd = m.apply({"params": p, "batch_stats": v["batch_stats"]}, x,
                             train=True, mutable=["batch_stats"])
            return sum(jnp.mean(t.astype(jnp.float32) ** 2) for t in o), upd
        return f

    (l0, u0), g0 = jax.value_and_grad(make_loss(m0), has_aux=True)(v["params"])
    (l1, u1), g1 = jax.value_and_grad(make_loss(m1), has_aux=True)(v["params"])
    assert float(l0) == float(l1)
    for a, b in zip(jax.tree_util.tree_leaves(g0), jax.tree_util.tree_leaves(g1)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree_util.tree_leaves(u0), jax.tree_util.tree_leaves(u1)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
