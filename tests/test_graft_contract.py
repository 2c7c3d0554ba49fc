"""Driver contract smoke tests: __graft_entry__ and bench shapes (CPU trace only)."""
import sys
from pathlib import Path

import jax
import pytest
import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def test_entry_traces():
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out_shape = jax.eval_shape(fn, *args)
    # (B, N, nc+5) with N = sum over strides of 3*(640/s)^2
    n = sum(3 * (640 // s) ** 2 for s in (8, 16, 32))
    assert out_shape.shape == (4, n, 15)


def test_bench_pipeline_traces():
    """The bench pipeline must trace with the expected output shapes."""
    import jax.numpy as jnp
    from functools import partial

    from skyeye_tpu.config import ModelConfig
    from skyeye_tpu.models import SkyEyeDetectorModule, decode_predictions
    from skyeye_tpu.ops.nms import _nms_single_impl

    IMG, BATCH = 256, 2
    cfg = ModelConfig.from_variant("s", nc=10)
    module = SkyEyeDetectorModule(config=cfg, dtype=jnp.bfloat16)
    variables = jax.eval_shape(
        lambda k: module.init(k, jnp.zeros((1, IMG, IMG, 3), jnp.float32), train=False),
        jax.random.PRNGKey(0),
    )

    def pipeline(v, frames):
        x = frames.astype(jnp.bfloat16) / 255.0
        outs = module.apply(v, x, train=False)
        dec = decode_predictions(outs, jnp.asarray(cfg.anchors), (IMG, IMG))
        return jax.vmap(
            partial(_nms_single_impl, conf_thres=0.25, iou_thres=0.45,
                    multi_label=False, agnostic=False, max_det=300, max_nms=1024)
        )(dec)

    frames = jax.ShapeDtypeStruct((BATCH, IMG, IMG, 3), jnp.uint8)
    det, n = jax.eval_shape(pipeline, variables, frames)
    assert det.shape == (BATCH, 300, 6)
    assert n.shape == (BATCH,)


@pytest.mark.slow
def test_dryrun_multichip_runs():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)
