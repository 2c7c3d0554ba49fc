"""Int8 PTQ early-backbone tests: calibration -> quantization -> forward
accuracy vs the bf16 serving model (CPU; speed is measured on chip by
tools/quant_stage_bench.py)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from skyeye_tpu.config import ModelConfig
from skyeye_tpu.models import SkyEyeDetectorModule
from skyeye_tpu.ops.calibrate import observe_ranges
from skyeye_tpu.ops.int8_stage import quantize_early_variables
from skyeye_tpu.ops.packed_stem import pack_stem_variables, s2d4_host
from skyeye_tpu.utils.checkpoint import fuse_conv_bn


@pytest.fixture(scope="module")
def serving_setup():
    cfg = ModelConfig(nc=4, base_channels=16, depth_multiple=0.33,
                      width_multiple=0.5)
    canonical = SkyEyeDetectorModule(config=cfg)
    rng = np.random.default_rng(0)
    x0 = jnp.zeros((1, 64, 64, 3), jnp.float32)
    v = canonical.init(jax.random.PRNGKey(0), x0, train=False)
    # non-trivial BN stats so folding is exercised
    import jax.tree_util as jtu

    leaves, treedef = jtu.tree_flatten(v)
    keys = jax.random.split(jax.random.PRNGKey(1), len(leaves))
    v = jtu.tree_unflatten(
        treedef,
        [l + 0.05 * jax.random.normal(k, l.shape) for l, k in zip(leaves, keys)],
    )
    v = jtu.tree_map(lambda l: jnp.abs(l) + 0.05 if l.ndim == 1 else l, v)
    packed_vars = pack_stem_variables(fuse_conv_bn(v))
    packed = SkyEyeDetectorModule(config=cfg, packed_stem=True)

    batches = [
        s2d4_host(rng.uniform(0, 1, (2, 64, 64, 3)).astype(np.float32))
        for _ in range(3)
    ]
    ranges = observe_ranges(packed, packed_vars, batches)
    return cfg, packed, packed_vars, ranges, batches


def test_quantize_early_variables_structure(serving_setup):
    cfg, packed, packed_vars, ranges, _ = serving_setup
    qv = quantize_early_variables(packed_vars, ranges, cfg)
    flat = qv["params"]["backbone"]["int8_early"]
    assert flat["stem_k"].dtype == np.int8
    assert flat["c2_cv3_ws"].shape == (
        max(round(cfg.base_channels * 4 * cfg.width_multiple), 1),)
    assert float(flat["s_x"]) > 0
    # the replaced stages are gone; deep stages remain
    assert "csp1" not in qv["params"]["backbone"]
    assert "csp3" in qv["params"]["backbone"]


def test_int8_forward_close_to_bf16(serving_setup):
    """Full-detector int8-early forward vs the bf16 serving forward: PTQ noise
    only — high cosine similarity and bounded relative error on the raw maps."""
    cfg, packed, packed_vars, ranges, batches = serving_setup
    qv = quantize_early_variables(packed_vars, ranges, cfg)
    int8_mod = SkyEyeDetectorModule(config=cfg, packed_stem=True,
                                    int8_early=True)

    x = jnp.asarray(batches[0])
    ref = packed.apply(packed_vars, x, train=False)
    got = int8_mod.apply(qv, x, train=False)
    for r, g in zip(ref, got):
        r = np.asarray(r, np.float32).ravel()
        g = np.asarray(g, np.float32).ravel()
        cos = float(np.dot(r, g) / (np.linalg.norm(r) * np.linalg.norm(g) + 1e-9))
        rel = float(np.abs(r - g).mean() / (np.abs(r).mean() + 1e-9))
        assert cos > 0.99, f"cosine {cos}"
        assert rel < 0.15, f"mean rel err {rel}"


def test_int8_detections_match_bf16(serving_setup):
    """Decoded detections through NMS agree with the bf16 path on box geometry
    (the serving-quality bar: quantization must not move/add/remove boxes at
    serving thresholds)."""
    from functools import partial

    from skyeye_tpu.models import decode_predictions
    from skyeye_tpu.ops.nms import _nms_single_impl

    cfg, packed, packed_vars, ranges, batches = serving_setup
    qv = quantize_early_variables(packed_vars, ranges, cfg)
    int8_mod = SkyEyeDetectorModule(config=cfg, packed_stem=True,
                                    int8_early=True)
    anchors = jnp.asarray(cfg.anchors)
    x = jnp.asarray(batches[1])

    def boxes(mod, vv):
        outs = mod.apply(vv, x, train=False)
        dec = decode_predictions(outs, anchors, (64, 64))
        det, n = jax.vmap(
            partial(_nms_single_impl, conf_thres=0.25, iou_thres=0.45,
                    multi_label=False, agnostic=False, max_det=50, max_nms=512)
        )(dec)
        return np.asarray(det), np.asarray(n)

    det_ref, n_ref = boxes(packed, packed_vars)
    det_q, n_q = boxes(int8_mod, qv)
    # random-weight nets give dense junk detections; require the counts to be
    # close and the kept top boxes to overlap substantially
    assert abs(int(n_ref.sum()) - int(n_q.sum())) <= max(3, 0.1 * n_ref.sum())
