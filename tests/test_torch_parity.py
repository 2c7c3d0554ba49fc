"""Golden numerical parity: repaired reference torch model vs this framework.

The shipped reference cannot run as-is — its SkyEyeBackbone reports wrong channel
counts, crashing the neck on forward (SURVEY.md §8#7) — so parity is established
against a minimally REPAIRED execution (only the channel report is corrected), per
SURVEY.md §7 "Reference is broken as-is".
"""
import importlib.util
import sys
import types
from pathlib import Path

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF = Path("/root/reference/skyeye/core/models")


@pytest.fixture(scope="module")
def refmod():
    """Import the reference model modules as a standalone package."""
    pkg = types.ModuleType("refmod")
    pkg.__path__ = [str(REF)]
    sys.modules["refmod"] = pkg
    mods = {}
    for name in ["blocks", "attention", "backbone", "detector"]:
        spec = importlib.util.spec_from_file_location(f"refmod.{name}", REF / f"{name}.py")
        mod = importlib.util.module_from_spec(spec)
        sys.modules[f"refmod.{name}"] = mod
        spec.loader.exec_module(mod)
        mods[name] = mod
    return mods


@pytest.fixture(scope="module")
def ref_model(refmod):
    """Construct the repaired reference model (s-variant geometry, 8 classes)."""
    backbone_mod = refmod["backbone"]
    detector_mod = refmod["detector"]

    # REPAIR: report the channels the backbone actually emits
    class FixedBackbone(backbone_mod.SkyEyeBackbone):
        def __init__(self, base_channels=64, depth_multiple=1.0, width_multiple=1.0):
            super().__init__(base_channels, depth_multiple, width_multiple)
            def sc(x):
                return max(round(x * width_multiple), 1)
            self.channels = [
                sc(base_channels * 4), sc(base_channels * 8), sc(base_channels * 16)
            ]

    detector_mod.SkyEyeBackbone = FixedBackbone

    # REPAIR 2: the reference init crashes on bias-free Linear layers (the CBAM MLP;
    # detector.py:339-341 `m.bias.data` with bias=None) — guard the None case
    def safe_init(self):
        for m in self.modules():
            if isinstance(m, torch.nn.Conv2d):
                n = m.kernel_size[0] * m.kernel_size[1] * m.out_channels
                m.weight.data.normal_(0, (2.0 / n) ** 0.5)
                if m.bias is not None:
                    m.bias.data.zero_()
            elif isinstance(m, torch.nn.BatchNorm2d):
                m.weight.data.fill_(1)
                m.bias.data.zero_()
            elif isinstance(m, torch.nn.Linear):
                m.weight.data.normal_(0, 0.01)
                if m.bias is not None:
                    m.bias.data.zero_()

    detector_mod.SkyEyeDetector._initialize_weights = safe_init
    cfg = {"nc": 8, "base_channels": 16, "depth_multiple": 0.33, "width_multiple": 1.0}
    # width_multiple=1.0 is the only value at which the reference neck can run
    # (it re-scales already-scaled channels, SURVEY.md §8); small base keeps it fast
    torch.manual_seed(7)
    model = detector_mod.SkyEyeDetector(cfg, 3)
    model.eval()
    return model, cfg


def test_forward_parity(ref_model):
    """Converted weights + same input -> same decoded output to ~1e-3."""
    import jax.numpy as jnp

    from skyeye_tpu.config import ModelConfig
    from skyeye_tpu.models import SkyEyeDetectorModule, decode_predictions
    from skyeye_tpu.utils.checkpoint import convert_torch_state_dict, merge_matching

    model, cfg = ref_model
    rng = np.random.default_rng(11)
    x = rng.uniform(0, 1, (1, 3, 64, 64)).astype(np.float32)

    with torch.no_grad():
        decoded_ref, raw_ref = model(torch.tensor(x))
    decoded_ref = decoded_ref.numpy()

    # our model with identical anchors: the reference default COCO-pixel list
    # interpreted as grid units (detector.py:39-43)
    anchors = tuple(
        tuple(tuple(float(v) for v in a) for a in level)
        for level in [
            [[10, 13], [16, 30], [33, 23]],
            [[30, 61], [62, 45], [59, 119]],
            [[116, 90], [156, 198], [373, 326]],
        ]
    )
    mcfg = ModelConfig(
        nc=cfg["nc"], base_channels=cfg["base_channels"],
        depth_multiple=cfg["depth_multiple"], width_multiple=cfg["width_multiple"],
        anchors=anchors,
    )
    module = SkyEyeDetectorModule(config=mcfg)
    import jax

    variables = module.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), train=False)

    converted = convert_torch_state_dict(model.state_dict())
    params, n_loaded, n_total = merge_matching(variables["params"], converted["params"])
    stats, n_stats, n_stats_total = merge_matching(
        variables["batch_stats"], converted["batch_stats"]
    )
    # every parameter must be mapped — anything unmatched is a converter bug
    assert n_loaded == n_total, f"only {n_loaded}/{n_total} params mapped"
    assert n_stats == n_stats_total

    x_nhwc = jnp.asarray(x.transpose(0, 2, 3, 1))
    outs = module.apply({"params": params, "batch_stats": stats}, x_nhwc, train=False)
    decoded = np.asarray(decode_predictions(outs, jnp.asarray(anchors), (64, 64)))

    assert decoded.shape == decoded_ref.shape
    # boxes are in pixels (magnitudes ~1e2-1e4 for the quirky P5 anchors); compare
    # with mixed tolerance
    np.testing.assert_allclose(decoded, decoded_ref, rtol=2e-3, atol=2e-3)


def test_raw_output_parity(ref_model):
    """Per-level raw logits match after layout transpose."""
    import jax
    import jax.numpy as jnp

    from skyeye_tpu.config import ModelConfig
    from skyeye_tpu.models import SkyEyeDetectorModule, to_reference_layout
    from skyeye_tpu.utils.checkpoint import convert_torch_state_dict, merge_matching

    model, cfg = ref_model
    rng = np.random.default_rng(3)
    x = rng.uniform(0, 1, (2, 3, 64, 64)).astype(np.float32)
    # eval forward returns (decoded, raw) (detector.py:320-322); use the raw half so
    # BatchNorm runs on running stats in both frameworks
    with torch.no_grad():
        _, raw_ref = model(torch.tensor(x))

    mcfg = ModelConfig(
        nc=cfg["nc"], base_channels=cfg["base_channels"],
        depth_multiple=cfg["depth_multiple"], width_multiple=cfg["width_multiple"],
    )
    module = SkyEyeDetectorModule(config=mcfg)
    variables = module.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), train=False)
    converted = convert_torch_state_dict(model.state_dict())
    params, _, _ = merge_matching(variables["params"], converted["params"])
    stats, _, _ = merge_matching(variables["batch_stats"], converted["batch_stats"])

    outs = module.apply(
        {"params": params, "batch_stats": stats},
        jnp.asarray(x.transpose(0, 2, 3, 1)), train=False,
    )
    ours_ref_layout = to_reference_layout(outs)
    for mine, theirs in zip(ours_ref_layout, raw_ref):
        np.testing.assert_allclose(
            np.asarray(mine), theirs.numpy(), rtol=2e-3, atol=2e-3
        )


def test_forward_parity_rect_input(ref_model):
    """Non-square input: decode stride/grid math must still match the reference."""
    import jax
    import jax.numpy as jnp

    from skyeye_tpu.config import ModelConfig
    from skyeye_tpu.models import SkyEyeDetectorModule, decode_predictions
    from skyeye_tpu.utils.checkpoint import convert_torch_state_dict, merge_matching

    model, cfg = ref_model
    rng = np.random.default_rng(21)
    x = rng.uniform(0, 1, (1, 3, 64, 96)).astype(np.float32)
    with torch.no_grad():
        decoded_ref, _ = model(torch.tensor(x))

    anchors = tuple(
        tuple(tuple(float(v) for v in a) for a in level)
        for level in [
            [[10, 13], [16, 30], [33, 23]],
            [[30, 61], [62, 45], [59, 119]],
            [[116, 90], [156, 198], [373, 326]],
        ]
    )
    mcfg = ModelConfig(
        nc=cfg["nc"], base_channels=cfg["base_channels"],
        depth_multiple=cfg["depth_multiple"], width_multiple=cfg["width_multiple"],
        anchors=anchors,
    )
    module = SkyEyeDetectorModule(config=mcfg)
    variables = module.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 96, 3)), train=False)
    converted = convert_torch_state_dict(model.state_dict())
    params, _, _ = merge_matching(variables["params"], converted["params"])
    stats, _, _ = merge_matching(variables["batch_stats"], converted["batch_stats"])
    outs = module.apply({"params": params, "batch_stats": stats},
                        jnp.asarray(x.transpose(0, 2, 3, 1)), train=False)
    decoded = np.asarray(decode_predictions(outs, jnp.asarray(anchors), (64, 96)))
    np.testing.assert_allclose(decoded, decoded_ref.numpy(), rtol=2e-3, atol=2e-3)


def test_transformer_layer_module_parity(refmod):
    """Module-level parity for the transformer variant's core block: the
    reference TransformerLayer (attention.py:244-309, torch nn.MultiheadAttention
    pre-norm encoder) vs skyeye_tpu's TransformerLayer with the same weights.
    Round-2 VERDICT noted tensor parity only covered the base model; this pins
    the enhanced/transformer building block too."""
    import jax
    import jax.numpy as jnp

    from skyeye_tpu.models.attention import TransformerLayer

    torch.manual_seed(0)
    C, heads, H, W, B = 64, 4, 8, 8, 2
    ref = refmod["attention"].TransformerLayer(C, heads, dropout=0.0).eval()

    x_t = torch.randn(B, C, H, W)
    with torch.no_grad():
        ref_out = ref(x_t).permute(0, 2, 3, 1).numpy()  # NCHW -> NHWC

    # map torch weights into the flax module
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params = {
        "norm1": {"scale": sd["norm1.weight"], "bias": sd["norm1.bias"]},
        "norm2": {"scale": sd["norm2.weight"], "bias": sd["norm2.bias"]},
        "attn": {
            # torch in_proj packs [q; k; v] along dim0 (3C, C); flax Dense kernel
            # is (C, 3C) with the same [q|k|v] feature order -> transpose
            "qkv": {"kernel": sd["self_attn.in_proj_weight"].T,
                    "bias": sd["self_attn.in_proj_bias"]},
            "proj": {"kernel": sd["self_attn.out_proj.weight"].T,
                     "bias": sd["self_attn.out_proj.bias"]},
        },
        "ff1": {"kernel": sd["feedforward.0.weight"].T,
                "bias": sd["feedforward.0.bias"]},
        "ff2": {"kernel": sd["feedforward.3.weight"].T,
                "bias": sd["feedforward.3.bias"]},
    }
    params = jax.tree_util.tree_map(jnp.asarray, params)

    m = TransformerLayer(num_heads=heads, dropout=0.0)
    x_j = jnp.asarray(x_t.permute(0, 2, 3, 1).numpy())
    out = np.asarray(m.apply({"params": params}, x_j, train=False))

    assert out.shape == ref_out.shape
    np.testing.assert_allclose(out, ref_out, rtol=1e-4, atol=1e-4)


def test_cbam_module_parity(refmod):
    """Module-level parity for the enhanced family's CBAM path: the reference
    CombinedAttention (attention.py:101-130 = ChannelAttention 11-60 +
    SpatialAttention 63-98) vs skyeye_tpu's CBAM with mapped weights. Together
    with the TransformerLayer/WindowedSelfAttention tests this pins every
    parity-testable enhanced-variant building block (CrossLayerAttention is a
    documented deviation — see test_reference_cross_layer_attention_is_degenerate)."""
    import jax
    import jax.numpy as jnp

    from skyeye_tpu.models.attention import CBAM

    torch.manual_seed(3)
    C, H, W, B = 32, 10, 10, 2
    ref = refmod["attention"].CombinedAttention(C, reduction_ratio=16).eval()
    x_t = torch.randn(B, C, H, W)
    with torch.no_grad():
        ref_out = ref(x_t).permute(0, 2, 3, 1).numpy()  # NCHW -> NHWC

    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params = {
        "channel": {
            # torch Linear weight (out, in) -> flax Dense kernel (in, out)
            "fc1": {"kernel": sd["channel_attention.shared_mlp.0.weight"].T},
            "fc2": {"kernel": sd["channel_attention.shared_mlp.2.weight"].T},
        },
        "spatial": {
            # torch Conv2d (out, in, kh, kw) -> flax Conv (kh, kw, in, out)
            "conv": {"kernel": sd["spatial_attention.conv.weight"].transpose(2, 3, 1, 0)},
        },
    }
    params = jax.tree_util.tree_map(jnp.asarray, params)

    m = CBAM(reduction_ratio=16)
    x_j = jnp.asarray(x_t.permute(0, 2, 3, 1).numpy())
    out = np.asarray(m.apply({"params": params}, x_j))

    assert out.shape == ref_out.shape
    np.testing.assert_allclose(out, ref_out, rtol=1e-4, atol=1e-5)


def test_reference_cross_layer_attention_is_degenerate(refmod):
    """Empirical proof of the documented M10 deviation (SURVEY.md): the reference
    CrossLayerAttention's region loop appends the SAME interpolated map r^2 times
    (attention.py:208-215) and its softmax normalizes over the H axis (dim=3 of a
    [B, heads, r^2, H, W] tensor, attention.py:180/232), so the "local region"
    contributes exactly a constant r^2 scale factor and no spatial-neighborhood
    structure: pre-projection features for region_size=2 are 4x those of
    region_size=1 with identical weights. skyeye_tpu's CrossLayerAttention is
    therefore a true local-region redesign, not a translation of this."""
    A = refmod["attention"]
    torch.manual_seed(5)
    # the reference additionally requires Cq == Ck (its q*k elementwise product
    # at attention.py:229 needs matching per-head dims), so the enhanced
    # detector's c4/c5 pairing crashes as-shipped; equal channels here
    Cq, Ck, H, W, B = 32, 32, 8, 8, 2
    r1 = A.CrossLayerAttention(Cq, Ck, region_size=1, heads=4).eval()
    r2 = A.CrossLayerAttention(Cq, Ck, region_size=2, heads=4).eval()
    r2.load_state_dict(r1.state_dict())  # identical weights

    q = torch.randn(B, Cq, H, W)
    k = torch.randn(B, Ck, H // 2, W // 2)
    with torch.no_grad():
        out1 = r1(q, k)
        out2 = r2(q, k)
        bias = r1.output_projection.bias.detach().view(1, -1, 1, 1)
        # out = W(u * r^2) + b where u is the softmaxed-value map for r=1
        np.testing.assert_allclose(
            (out2 - bias).numpy(), 4.0 * (out1 - bias).numpy(), rtol=1e-4, atol=1e-4
        )


def test_windowed_attention_module_parity(refmod):
    """Module-level parity for the windowed-attention primitive (reference
    attention.py:312-399 — shipped but unused there; a real model component here
    via SwinBlock) with mapped weights, including the relative-position bias
    table and a shifted-window mask."""
    import jax
    import jax.numpy as jnp

    from skyeye_tpu.models.attention import WindowedSelfAttention, shift_window_mask

    torch.manual_seed(1)
    C, heads, ws = 32, 4, 4
    H = W = 8
    nW = (H // ws) * (W // ws)
    B = 2
    ref = refmod["attention"].WindowedSelfAttention(C, ws, heads).eval()

    x_t = torch.randn(B * nW, ws * ws, C)
    mask_j = shift_window_mask(H, W, ws, shift=2)
    mask_t = torch.from_numpy(np.asarray(mask_j))
    with torch.no_grad():
        ref_out = ref(x_t, mask_t).numpy()
        ref_out_nomask = ref(x_t).numpy()

    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params = {
        "qkv": {"kernel": sd["qkv.weight"].T, "bias": sd["qkv.bias"]},
        "proj": {"kernel": sd["proj.weight"].T, "bias": sd["proj.bias"]},
        "relative_position_bias_table": sd["relative_position_bias_table"],
    }
    params = jax.tree_util.tree_map(jnp.asarray, params)

    m = WindowedSelfAttention(dim=C, window_size=ws, num_heads=heads)
    x_j = jnp.asarray(x_t.numpy())
    out = np.asarray(m.apply({"params": params}, x_j, mask_j))
    out_nomask = np.asarray(m.apply({"params": params}, x_j, None))

    np.testing.assert_allclose(out_nomask, ref_out_nomask, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(out, ref_out, rtol=1e-4, atol=1e-4)


@pytest.fixture(scope="module")
def ref_enhanced_model(refmod, ref_model):
    """Repaired reference EnhancedSkyEyeDetector (detector.py:436-501).

    Inherits repairs 1-2 from ref_model (channel report, None-bias init). REPAIR 3:
    the shipped CrossLayerAttention's q*k product needs Cq == Ck per head
    (attention.py:229 view + elementwise product), so the enhanced c4/c5 pairing
    crashes as-shipped; minimal repair projects Q to key_channels (the scale stays
    the reference's 1/sqrt(query_channels), set before the overwrite).
    """
    attention_mod = refmod["attention"]
    detector_mod = refmod["detector"]

    class FixedCrossLayerAttention(attention_mod.CrossLayerAttention):
        def __init__(self, query_channels, key_channels, **kw):
            super().__init__(query_channels, key_channels, **kw)
            self.query_projection = torch.nn.Conv2d(query_channels, key_channels, 1)
            self.query_channels = key_channels  # forward()'s multi-head view

    prev = detector_mod.CrossLayerAttention
    detector_mod.CrossLayerAttention = FixedCrossLayerAttention
    cfg = {"nc": 8, "base_channels": 16, "depth_multiple": 0.33, "width_multiple": 1.0}
    torch.manual_seed(9)
    model = detector_mod.EnhancedSkyEyeDetector(cfg, 3)
    model.eval()
    detector_mod.CrossLayerAttention = prev
    return model, cfg


def test_enhanced_forward_parity(ref_enhanced_model):
    """FULL-MODEL parity for the enhanced variant (EnhancedSkyEyeDetector,
    reference detector.py:436-501): converted weights + same input -> same decoded
    output, with our CrossLayerAttention in ref_exact mode reproducing the repaired
    reference's degenerate attention semantics (softmax over image rows, r^2 * attn
    * V). Complements the module-level degeneracy proof above; the shipped default
    (ref_exact=False) is the documented true local-region redesign (SURVEY.md M10).
    """
    import jax
    import jax.numpy as jnp

    from skyeye_tpu.config import ModelConfig
    from skyeye_tpu.models import SkyEyeDetectorModule, decode_predictions
    from skyeye_tpu.utils.checkpoint import convert_torch_state_dict, merge_matching

    model, cfg = ref_enhanced_model
    rng = np.random.default_rng(17)
    x = rng.uniform(0, 1, (2, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        decoded_ref, _ = model(torch.tensor(x))
    decoded_ref = decoded_ref.numpy()

    anchors = tuple(
        tuple(tuple(float(v) for v in a) for a in level)
        for level in [
            [[10, 13], [16, 30], [33, 23]],
            [[30, 61], [62, 45], [59, 119]],
            [[116, 90], [156, 198], [373, 326]],
        ]
    )
    mcfg = ModelConfig(
        nc=cfg["nc"], base_channels=cfg["base_channels"],
        depth_multiple=cfg["depth_multiple"], width_multiple=cfg["width_multiple"],
        anchors=anchors, enhanced=True,
    )
    module = SkyEyeDetectorModule(config=mcfg, ref_exact_cross_attn=True)
    variables = module.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), train=False)

    converted = convert_torch_state_dict(model.state_dict())
    params, n_loaded, n_total = merge_matching(variables["params"], converted["params"])
    stats, n_stats, n_stats_total = merge_matching(
        variables["batch_stats"], converted["batch_stats"]
    )
    assert n_loaded == n_total, f"only {n_loaded}/{n_total} params mapped"
    assert n_stats == n_stats_total

    outs = module.apply({"params": params, "batch_stats": stats},
                        jnp.asarray(x.transpose(0, 2, 3, 1)), train=False)
    decoded = np.asarray(decode_predictions(outs, jnp.asarray(anchors), (64, 64)))
    assert decoded.shape == decoded_ref.shape
    np.testing.assert_allclose(decoded, decoded_ref, rtol=2e-3, atol=2e-3)
