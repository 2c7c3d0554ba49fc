"""Optimizer construction: SGD-nesterov / Adam with YOLOv5-style parameter groups.

Capability parity (reference /root/reference/skyeye/cli/train.py:94-120): three param
groups — biases (no weight decay), BatchNorm scales (no decay), other weights
(decayed) — SGD(momentum=0.937, nesterov) or Adam(betas=(momentum, 0.999)); weight
decay is rescaled by total_batch/nominal(64) with gradient accumulation to the
nominal batch (train.py:94-96).

TPU-native: one optax chain with a decay mask over the param pytree instead of three
torch param groups; accumulation via optax.MultiSteps (one jitted step, no host loop).
"""
from __future__ import annotations

from typing import Any, Callable, Dict, Optional

import jax
import optax

NOMINAL_BATCH = 64


def decay_mask(params) -> Any:
    """True for parameters that receive weight decay: conv/dense kernels only.
    Biases and all BatchNorm parameters (scale/bias, named under 'bn') are excluded."""
    def mask_fn(path, _):
        names = [getattr(k, "key", str(k)) for k in path]
        leaf = names[-1]
        in_bn = any(n == "bn" or n.startswith("norm") for n in names)
        return leaf == "kernel" and not in_bn

    return jax.tree_util.tree_map_with_path(mask_fn, params)


def accumulation_steps(batch_size: int, nominal: int = NOMINAL_BATCH) -> int:
    return max(round(nominal / batch_size), 1)


def bias_labels(params) -> Any:
    """Partition labels: 'bias' for every bias leaf, 'other' for the rest
    (the reference's pg2 group, train.py:102-120)."""
    return jax.tree_util.tree_map_with_path(
        lambda path, _: "bias"
        if getattr(path[-1], "key", str(path[-1])) == "bias"
        else "other",
        params,
    )


def build_optimizer(
    lr_schedule: Callable,
    hyp: Dict[str, float],
    params,
    adam: bool = False,
    batch_size: int = 16,
    accumulate: Optional[int] = None,
    warmup_steps: int = 0,
) -> optax.GradientTransformation:
    """SGD-nesterov/Adam with YOLOv5 group semantics.

    With warmup_steps > 0 the YOLOv5 warmup applies: momentum ramps
    warmup_momentum -> momentum and the bias group's lr starts at warmup_bias_lr and
    anneals INTO the main schedule (reference-convention warmup, reconstructed from
    the truncated train.py; SURVEY.md C1).
    """
    accum = accumulate if accumulate is not None else accumulation_steps(batch_size)
    # weight-decay rescale to the effective (accumulated) batch (train.py:96)
    wd = hyp["weight_decay"] * batch_size * accum / NOMINAL_BATCH

    import jax.numpy as jnp

    def momentum_schedule(step):
        if warmup_steps <= 0:
            return hyp["momentum"]
        w = jnp.clip(step / warmup_steps, 0.0, 1.0)
        return hyp["warmup_momentum"] + w * (hyp["momentum"] - hyp["warmup_momentum"])

    def bias_lr_schedule(step):
        if warmup_steps <= 0:
            return lr_schedule(step)
        w = jnp.clip(step / warmup_steps, 0.0, 1.0)
        warm = hyp["warmup_bias_lr"] + w * (hyp["lr0"] - hyp["warmup_bias_lr"])
        return jnp.where(step < warmup_steps, warm, lr_schedule(step))

    if adam:
        momentum_core = optax.scale_by_adam(b1=hyp["momentum"], b2=0.999)

        def make_chain(lr):
            return optax.chain(
                optax.add_decayed_weights(wd, mask=decay_mask),
                momentum_core,
                optax.scale_by_learning_rate(lr),
            )
    else:
        def make_chain(lr):
            return optax.chain(
                optax.add_decayed_weights(wd, mask=decay_mask),
                optax.inject_hyperparams(optax.trace, static_args=("nesterov",))(
                    decay=momentum_schedule, nesterov=True
                ),
                optax.scale_by_learning_rate(lr),
            )

    if warmup_steps > 0:
        inner = optax.multi_transform(
            {"bias": make_chain(bias_lr_schedule), "other": make_chain(lr_schedule)},
            bias_labels,
        )
    else:
        inner = make_chain(lr_schedule)
    if accum > 1:
        return optax.MultiSteps(inner, every_k_schedule=accum)
    return inner


RUNTIME_HYPERPARAMS = ("lr", "bias_lr", "momentum")


def build_optimizer_runtime(
    hyp: Dict[str, float],
    params,
    adam: bool = False,
    batch_size: int = 16,
    accumulate: Optional[int] = None,
) -> optax.GradientTransformation:
    """Same optimizer semantics as `build_optimizer`, but lr / bias-group lr /
    momentum are RUNTIME hyperparameters (optax.inject_hyperparams state) instead of
    traced schedule closures.

    The train step overrides `opt_state.hyperparams` each step from values the host
    computes with `schedules.host_schedule` — so epoch-count / hyp / warmup changes
    never recompile the step (round-2 VERDICT #8; the schedules module used to bake
    epochs & steps_per_epoch into the jaxpr as constants).
    """
    accum = accumulate if accumulate is not None else accumulation_steps(batch_size)
    wd = hyp["weight_decay"] * batch_size * accum / NOMINAL_BATCH
    b1 = hyp["momentum"]

    def factory(lr, bias_lr, momentum):
        def chain(rate):
            if adam:
                core = optax.scale_by_adam(b1=b1, b2=0.999)
            else:
                core = optax.trace(decay=momentum, nesterov=True)
            return optax.chain(
                optax.add_decayed_weights(wd, mask=decay_mask),
                core,
                optax.scale_by_learning_rate(rate),
            )

        inner = optax.multi_transform(
            {"bias": chain(bias_lr), "other": chain(lr)}, bias_labels
        )
        if accum > 1:
            return optax.MultiSteps(inner, every_k_schedule=accum)
        return inner

    return optax.inject_hyperparams(factory)(
        lr=hyp["lr0"], bias_lr=hyp["lr0"], momentum=hyp["momentum"]
    )
