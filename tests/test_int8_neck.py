"""Int8 serving neck (ops/int8_neck.py): structure + end-to-end closeness.

The int8 neck is an approximation (weight quant + calibrated activation
requants), so the test asserts (a) the module/variable plumbing roundtrips,
(b) head outputs stay CLOSE to the bf16 serving model on in-calibration
inputs, (c) obviously-broken scales would fail (correlation gate).
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from skyeye_tpu.config import ModelConfig
from skyeye_tpu.models import SkyEyeDetectorModule
from skyeye_tpu.ops.calibrate import observe_ranges
from skyeye_tpu.ops.int8_neck import quantize_neck_variables
from skyeye_tpu.utils.checkpoint import fuse_conv_bn


def test_int8_neck_end_to_end_close():
    cfg = ModelConfig(nc=3, base_channels=16, depth_multiple=0.33,
                      width_multiple=0.25)
    canonical = SkyEyeDetectorModule(config=cfg, dtype=jnp.float32)
    rng = np.random.default_rng(3)
    # train-mode init then a few "training-ish" steps are overkill here;
    # random-but-BN-folded weights exercise the same graph
    variables = canonical.init(jax.random.PRNGKey(0),
                               jnp.zeros((1, 64, 64, 3)), train=False)
    fused = fuse_conv_bn(variables)

    batches = [rng.uniform(0, 1, (2, 64, 64, 3)).astype(np.float32)
               for _ in range(2)]
    ranges = observe_ranges(canonical, fused, batches)

    q_vars = quantize_neck_variables(fused, ranges, cfg)
    int8_mod = SkyEyeDetectorModule(config=cfg, dtype=jnp.float32,
                                    int8_neck=True)

    x = jnp.asarray(batches[0])
    ref = canonical.apply(fused, x, train=False)
    got = int8_mod.apply(q_vars, x, train=False)

    for r, g in zip(ref, got):
        r, g = np.asarray(r, np.float32), np.asarray(g, np.float32)
        assert r.shape == g.shape
        corr = np.corrcoef(r.ravel(), g.ravel())[0, 1]
        assert corr > 0.995, corr
        # logits error bounded (random weights make logits small; the real
        # accuracy gate is mAP on converged weights, tools/int8_serving_gate.py)
        assert np.max(np.abs(r - g)) < 0.5, np.max(np.abs(r - g))


def test_api_quantize_int8_neck_end_to_end():
    """SkyEyeDetector.quantize_int8('neck'): calibrate, rewrite, predict."""
    from skyeye_tpu.api import SkyEyeDetector

    cfg = ModelConfig(nc=3, base_channels=16, depth_multiple=0.33,
                      width_multiple=0.25)
    det = SkyEyeDetector(cfg=cfg, img_size=64, conf_thres=0.01)
    rng = np.random.default_rng(5)
    calib = [rng.integers(0, 256, (72, 96, 3), np.uint8) for _ in range(4)]
    det.quantize_int8(calib, mode="neck")
    assert det._int8_neck and det.module.int8_neck
    # the quantized detector still serves end-to-end (predict -> Results)
    res = det([rng.integers(0, 256, (80, 100, 3), np.uint8)])
    assert len(res.xyxy) == 1
    det.quantize_int8(calib)  # idempotent second call is a no-op
    with pytest.raises(ValueError):
        det.quantize_int8(calib, mode="stem")
