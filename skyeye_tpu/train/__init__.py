"""Training machinery: state, step, optimizer groups, schedules, EMA, early stop."""
from .ema import EMAState, ema_init, ema_update
from .optimizer import (
    accumulation_steps, build_optimizer, build_optimizer_runtime, decay_mask,
)
from .schedules import (
    host_schedule, linear_schedule, make_lr_schedule, one_cycle_cosine,
)
from .trainer import (
    EarlyStopping,
    TrainState,
    create_train_state,
    fitness,
    make_train_step,
)

__all__ = [
    "EMAState",
    "ema_init",
    "ema_update",
    "accumulation_steps",
    "build_optimizer",
    "build_optimizer_runtime",
    "decay_mask",
    "host_schedule",
    "linear_schedule",
    "make_lr_schedule",
    "one_cycle_cosine",
    "EarlyStopping",
    "TrainState",
    "create_train_state",
    "fitness",
    "make_train_step",
]
