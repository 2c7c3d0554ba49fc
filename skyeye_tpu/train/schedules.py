"""Learning-rate schedules: warmup + cosine/linear to `lrf * lr0`.

Capability parity (reference /root/reference/skyeye/cli/train.py:126-133): cosine
one-cycle `lr = lrf + (1 - lrf) * (1 + cos(pi * e / E)) / 2` or linear
`lr = (1 - e/E) * (1 - lrf) + lrf`, times lr0 — plus the YOLOv5-convention warmup
(bias lr from warmup_bias_lr down/up to lr0, momentum 0.8 -> 0.937) whose wiring fell
in the truncated half of train.py (SURVEY.md C1).
"""
from __future__ import annotations

from typing import Dict, Optional


def one_cycle_cosine(lr0: float, lrf: float, epochs: int, steps_per_epoch: int,
                     warmup_steps: int = 0, warmup_init: float = 0.0):
    """Per-step schedule: linear warmup then cosine decay to lr0 * lrf."""
    def schedule(step):
        import jax.numpy as jnp

        step = jnp.asarray(step, jnp.float32)
        e = step / steps_per_epoch
        cos_lr = lr0 * (lrf + (1.0 - lrf) * (1.0 + jnp.cos(jnp.pi * e / epochs)) / 2.0)
        if warmup_steps > 0:
            w = jnp.clip(step / warmup_steps, 0.0, 1.0)
            warm_lr = warmup_init + w * (lr0 - warmup_init)
            return jnp.where(step < warmup_steps, warm_lr, cos_lr)
        return cos_lr

    return schedule


def linear_schedule(lr0: float, lrf: float, epochs: int, steps_per_epoch: int,
                    warmup_steps: int = 0, warmup_init: float = 0.0):
    def schedule(step):
        import jax.numpy as jnp

        step = jnp.asarray(step, jnp.float32)
        e = step / steps_per_epoch
        lin = lr0 * ((1.0 - e / epochs) * (1.0 - lrf) + lrf)
        if warmup_steps > 0:
            w = jnp.clip(step / warmup_steps, 0.0, 1.0)
            warm_lr = warmup_init + w * (lr0 - warmup_init)
            return jnp.where(step < warmup_steps, warm_lr, lin)
        return lin

    return schedule


def host_schedule(hyp: Dict[str, float], epochs: int, steps_per_epoch: int,
                  cos_lr: bool = True, warmup_steps: Optional[int] = None):
    """Host-side schedule: returns f(opt_step) -> {"lr", "bias_lr", "momentum"}
    as plain Python floats.

    This is the runtime-scalar schedule path (round-2 VERDICT #8): the jitted train
    step takes these three scalars as INPUTS (optax.inject_hyperparams state
    override), so changing --epochs / steps-per-epoch / any hyp value changes only
    host floats — the compiled step executable is reused, instead of a fresh
    10-15 min remote compile per closed-over constant. Formulas are identical to
    one_cycle_cosine / linear_schedule + the YOLOv5 warmup conventions
    (reference cli/train.py:126-133 + the truncated warmup wiring).
    """
    import math

    if warmup_steps is None:
        warmup_steps = max(int(round(hyp.get("warmup_epochs", 3.0) * steps_per_epoch)), 100)
    lr0, lrf = float(hyp["lr0"]), float(hyp["lrf"])
    momentum = float(hyp.get("momentum", 0.937))
    warm_mom = float(hyp.get("warmup_momentum", 0.8))
    warm_bias_lr = float(hyp.get("warmup_bias_lr", 0.1))

    def main_lr(step: float) -> float:
        e = step / steps_per_epoch
        if cos_lr:
            return lr0 * (lrf + (1.0 - lrf) * (1.0 + math.cos(math.pi * e / epochs)) / 2.0)
        return lr0 * ((1.0 - e / epochs) * (1.0 - lrf) + lrf)

    def values(opt_step: int) -> Dict[str, float]:
        s = float(opt_step)
        lr = main_lr(s)
        bias_lr = lr
        mom = momentum
        if warmup_steps > 0 and s < warmup_steps:
            w = min(s / warmup_steps, 1.0)
            lr = w * lr0
            bias_lr = warm_bias_lr + w * (lr0 - warm_bias_lr)
            mom = warm_mom + w * (momentum - warm_mom)
        return {"lr": lr, "bias_lr": bias_lr, "momentum": mom}

    return values


def make_lr_schedule(hyp: Dict[str, float], epochs: int, steps_per_epoch: int,
                     cos_lr: bool = True, warmup_steps: Optional[int] = None):
    """`steps_per_epoch` and `warmup_steps` must be denominated in OPTIMIZER steps.
    With gradient accumulation (optax.MultiSteps) the schedule count only advances
    once per `accumulate` micro-steps, so callers must divide micro-step counts by
    `accumulate` before passing them here."""
    if warmup_steps is None:
        warmup_steps = max(int(round(hyp.get("warmup_epochs", 3.0) * steps_per_epoch)), 100)
    maker = one_cycle_cosine if cos_lr else linear_schedule
    return maker(
        hyp["lr0"], hyp["lrf"], epochs, steps_per_epoch,
        warmup_steps=warmup_steps, warmup_init=0.0,
    )
