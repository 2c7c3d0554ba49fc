"""Int8 serving stem (ops/int8_stem.py): the integer path must be EXACT.

The only approximation allowed vs the bf16 stem is weight quantization: with
the dequantized kernel (kq * ws) substituted into the float reference, the
int8 conv + shift-correction epilogue must reproduce it to f32 accumulation
noise — including the border ring, where the +128 correction varies.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from skyeye_tpu.ops.int8_stem import Int8PackedStem, quantize_stem_variables


def _mk_params(key, cin=48, cout=32):
    k = jax.random.normal(key, (3, 3, cin, cout), jnp.float32) * 0.05
    bias = jax.random.normal(jax.random.fold_in(key, 1), (cout,), jnp.float32)
    k = np.asarray(k)
    ws = np.abs(k).reshape(-1, cout).max(0) / 127.0
    kq = np.clip(np.round(k / ws), -127, 127).astype(np.int8)
    k_deq = kq.astype(np.float32) * ws
    taps = 128.0 * k_deq.sum(axis=2)
    params = {
        "kernel_q": jnp.asarray(kq),
        "w_scale": jnp.asarray(ws, jnp.float32),
        "bias": bias,
        "tap_sums": jnp.asarray(taps, jnp.float32),
    }
    return params, jnp.asarray(k_deq), bias


def test_int8_stem_exact_vs_dequantized_reference():
    key = jax.random.PRNGKey(0)
    params, k_deq, bias = _mk_params(key)
    x = jax.random.randint(jax.random.fold_in(key, 2), (2, 16, 16, 48), 0, 256,
                           jnp.int32).astype(jnp.uint8)

    mod = Int8PackedStem(out_channels=32, dtype=jnp.float32)
    got = mod.apply({"params": params}, x)

    ref = jax.lax.conv_general_dilated(
        x.astype(jnp.float32), k_deq, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    ref = ref + bias[None, None, None, :]
    ref = ref * jax.nn.sigmoid(ref)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-3, rtol=1e-4)
    # the border ring specifically (the +128 correction varies there)
    np.testing.assert_allclose(np.asarray(got[:, 0, :, :]),
                               np.asarray(ref[:, 0, :, :]), atol=2e-3, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(got[:, :, -1, :]),
                               np.asarray(ref[:, :, -1, :]), atol=2e-3, rtol=1e-4)


def test_quantize_stem_variables_and_full_model_close():
    """End-to-end: the int8-stem serving model reproduces the bf16 serving
    model's head outputs to weight-quantization tolerance on the same frames."""
    from skyeye_tpu.config import ModelConfig
    from skyeye_tpu.models import SkyEyeDetectorModule
    from skyeye_tpu.ops.packed_stem import (
        fold_input_scale,
        pack_stem_variables,
        s2d4_host,
    )
    from skyeye_tpu.utils.checkpoint import fuse_conv_bn

    cfg = ModelConfig(nc=3, base_channels=16, depth_multiple=0.33,
                      width_multiple=0.25)
    canonical = SkyEyeDetectorModule(config=cfg, dtype=jnp.float32)
    variables = canonical.init(jax.random.PRNGKey(0),
                               jnp.zeros((1, 64, 64, 3)), train=False)
    serving_vars = fold_input_scale(pack_stem_variables(fuse_conv_bn(variables)))

    rng = np.random.default_rng(7)
    frames = rng.integers(0, 256, (2, 64, 64, 3), np.uint8)
    packed = jnp.asarray(s2d4_host(frames))

    bf16_mod = SkyEyeDetectorModule(config=cfg, dtype=jnp.float32,
                                    packed_stem=True)
    ref = bf16_mod.apply(serving_vars, packed.astype(jnp.float32), train=False)

    q_vars = quantize_stem_variables(serving_vars)
    int8_mod = SkyEyeDetectorModule(config=cfg, dtype=jnp.float32,
                                    packed_stem=True, int8_stem=True)
    got = int8_mod.apply(q_vars, packed, train=False)

    for r, g in zip(ref, got):
        r, g = np.asarray(r), np.asarray(g)
        # head logits: weight-quant error through the whole net stays small
        assert np.max(np.abs(r - g)) < 0.15, np.max(np.abs(r - g))
        corr = np.corrcoef(r.ravel(), g.ravel())[0, 1]
        assert corr > 0.9999, corr
