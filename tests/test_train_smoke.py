"""Fast-lane train-step smoke (VERDICT r4 #6).

The full train suite (tests/test_train.py) is slow-marked as a module, which
left the default lane (`-m "not slow and not tpu"`) with ZERO train-step
regressions. This file is the always-on smoke: one tiny model, one compiled
step, loss decreases over a few steps AND the n_valid padding mask changes the
loss — the two invariants that catch a silently broken trainer. Budget ≤15 s
on an idle host (single compile amortized across both checks).
"""
import jax
import jax.numpy as jnp
import numpy as np

from skyeye_tpu.config import DEFAULT_HYP, ModelConfig
from skyeye_tpu.losses import ComputeLoss
from skyeye_tpu.models import SkyEyeDetectorModule
from skyeye_tpu.train import build_optimizer, create_train_state, make_train_step

KEY = jax.random.PRNGKey(0)


def test_train_step_smoke_loss_decreases_and_n_valid_masks():
    cfg = ModelConfig(nc=3, base_channels=16, depth_multiple=0.33,
                      width_multiple=0.25)
    module = SkyEyeDetectorModule(config=cfg)
    variables = module.init(KEY, jnp.zeros((2, 64, 64, 3)), train=True)
    loss_fn = ComputeLoss(jnp.asarray(cfg.anchors), cfg.nc)
    tx = build_optimizer(lambda s: 0.05, DEFAULT_HYP, variables["params"],
                         batch_size=64)  # accumulate=1
    state = create_train_state(variables, tx)
    step = jax.jit(make_train_step(module, loss_fn, tx))

    rng = np.random.default_rng(0)
    B, M, nc = 2, 8, 3
    images = rng.uniform(0, 1, (B, 64, 64, 3)).astype(np.float32)
    targets = np.zeros((B, M, 6), np.float32)
    mask = np.zeros((B, M), bool)
    for b in range(B):
        for t in range(3):
            targets[b, t] = [0, rng.integers(0, nc), rng.uniform(0.3, 0.7),
                             rng.uniform(0.3, 0.7), rng.uniform(0.1, 0.3),
                             rng.uniform(0.1, 0.3)]
            mask[b, t] = True
    batch = {"images": jnp.asarray(images), "targets": jnp.asarray(targets),
             "mask": jnp.asarray(mask)}

    losses = []
    for _ in range(8):
        state, metrics = step(state, batch)
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all(), losses
    assert losses[-1] < losses[0], losses
    assert int(state.step) == 8
    assert int(state.ema.updates) == 8

    # n_valid padding mask: a wrap-around duplicate row (n_valid=1) must not
    # contribute — same compiled step, no extra compile.
    full = dict(batch, n_valid=jnp.asarray(B, jnp.int32))
    padded = dict(batch, n_valid=jnp.asarray(1, jnp.int32))
    _, m_full = step(state, full)
    _, m_padded = step(state, padded)
    assert np.isfinite(float(m_padded["loss"]))
    assert float(m_full["loss"]) != float(m_padded["loss"])
