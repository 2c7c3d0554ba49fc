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
