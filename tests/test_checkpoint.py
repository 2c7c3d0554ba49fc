"""Checkpoint tests: orbax round-trip, torch .pt load, BN fusion, stripping."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from skyeye_tpu.config import ModelConfig
from skyeye_tpu.models import SkyEyeDetectorModule
from skyeye_tpu.utils.checkpoint import (
    fuse_conv_bn,
    load_checkpoint,
    load_model,
    merge_matching,
    save_checkpoint,
    strip_checkpoint,
)

KEY = jax.random.PRNGKey(0)


def tiny_variables():
    cfg = ModelConfig(nc=4, base_channels=16, depth_multiple=0.33, width_multiple=0.25)
    module = SkyEyeDetectorModule(config=cfg)
    variables = module.init(KEY, jnp.zeros((1, 64, 64, 3)), train=False)
    return cfg, module, variables


@pytest.mark.slow
def test_orbax_roundtrip(tmp_path):
    cfg, module, variables = tiny_variables()
    payload = {
        "params": variables["params"],
        "batch_stats": variables["batch_stats"],
        "ema_params": variables["params"],
        "epoch": 7,
        "best_fitness": 0.42,
        "config": cfg.to_dict(),
    }
    save_checkpoint(tmp_path / "last", payload)
    restored = load_checkpoint(tmp_path / "last")
    assert int(restored["epoch"]) == 7
    assert abs(float(restored["best_fitness"]) - 0.42) < 1e-9
    for (pa, a), (pb, b) in zip(
        jax.tree_util.tree_flatten_with_path(variables["params"])[0],
        jax.tree_util.tree_flatten_with_path(restored["params"])[0],
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_strip_checkpoint(tmp_path):
    cfg, module, variables = tiny_variables()
    payload = {
        "params": variables["params"],
        "batch_stats": variables["batch_stats"],
        "ema_params": variables["params"],
        "opt_state": {"momentum": np.ones(3)},
        "epoch": 3,
        "best_fitness": 0.1,
        "config": cfg.to_dict(),
    }
    save_checkpoint(tmp_path / "best", payload)
    strip_checkpoint(tmp_path / "best")
    restored = load_checkpoint(tmp_path / "best")
    assert "opt_state" not in restored
    assert "params" in restored


def test_load_model_from_checkpoint_dir(tmp_path):
    cfg, module, variables = tiny_variables()
    save_checkpoint(
        tmp_path / "w",
        {
            "params": variables["params"],
            "batch_stats": variables["batch_stats"],
            "config": cfg.to_dict(),
        },
    )
    module2, variables2, config2 = load_model(tmp_path / "w")
    assert config2.nc == 4
    out = module2.apply(variables2, jnp.zeros((1, 64, 64, 3)), train=False)
    assert len(out) == 3


def test_fuse_conv_bn_preserves_output():
    cfg, module, variables = tiny_variables()
    # make BN stats non-trivial so fusion actually does something
    x = jax.random.normal(KEY, (2, 64, 64, 3))
    _, updates = module.apply(variables, x, train=True, mutable=["batch_stats"])
    variables = {"params": variables["params"], "batch_stats": updates["batch_stats"]}

    ref = module.apply(variables, x, train=False)
    fused = fuse_conv_bn(variables)
    out = module.apply(fused, x, train=False)
    for a, b in zip(ref, out):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-2, atol=2e-3)


@pytest.mark.slow
def test_load_torch_pt_file(tmp_path):
    """Write a torch checkpoint in the bare-state-dict convention and load it."""
    torch = pytest.importorskip("torch")
    # a state dict with one recognizable key and correct shape for skyeye_s stem:
    # stem conv: in 12 (4*3), out = round(64*0.5) = 32, k=3
    sd = {
        "backbone.backbone.stage1.0.conv.conv.weight": torch.zeros(32, 12, 3, 3),
        "backbone.backbone.stage1.0.conv.bn.weight": torch.full((32,), 2.0),
        "backbone.backbone.stage1.0.conv.bn.bias": torch.zeros(32),
        "backbone.backbone.stage1.0.conv.bn.running_mean": torch.zeros(32),
        "backbone.backbone.stage1.0.conv.bn.running_var": torch.ones(32),
    }
    torch.save(sd, tmp_path / "skyeye_s.pt")
    module, variables, config = load_model(tmp_path / "skyeye_s.pt")
    scale = np.asarray(variables["params"]["backbone"]["stem"]["bn"]["scale"])
    np.testing.assert_allclose(scale, 2.0)
    # the stem kernel arrives fused to the 6x6 stride-2 form (models/blocks.py)
    kern = np.asarray(variables["params"]["backbone"]["stem"]["conv"]["kernel"])
    assert kern.shape == (6, 6, 3, 32)
    np.testing.assert_allclose(kern, 0.0)
