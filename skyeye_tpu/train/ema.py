"""Exponential moving average of model parameters as a pytree lerp.

Capability parity: ModelEMA (reference /root/reference/skyeye/utils/torch_utils.py:308-358)
— decay ramp d(t) = decay * (1 - exp(-t / tau)), applied to all float parameters.
TPU-native: pure pytree ops inside the jitted train step (no module copies, no
state_dict walks); EMA state is just another sharded pytree.
"""
from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp


class EMAState(NamedTuple):
    params: Any  # pytree mirroring model params
    updates: jnp.ndarray  # () int32 update counter


def ema_init(params) -> EMAState:
    return EMAState(
        params=jax.tree_util.tree_map(jnp.asarray, params),
        updates=jnp.zeros((), jnp.int32),
    )


def ema_update(state: EMAState, new_params, decay: float = 0.9999,
               tau: float = 2000.0) -> EMAState:
    updates = state.updates + 1
    d = decay * (1.0 - jnp.exp(-updates.astype(jnp.float32) / tau))
    new_ema = jax.tree_util.tree_map(
        lambda e, p: e * d + p.astype(e.dtype) * (1.0 - d), state.params, new_params
    )
    return EMAState(params=new_ema, updates=updates)
