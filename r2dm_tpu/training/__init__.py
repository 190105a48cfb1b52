from .ema import EMAConfig, ema_decay, ema_update
from .optim import cosine_schedule_with_warmup, make_optimizer
from .step import TrainState, init_train_state, jit_train_step, make_train_step

__all__ = [
    "EMAConfig",
    "ema_decay",
    "ema_update",
    "cosine_schedule_with_warmup",
    "make_optimizer",
    "TrainState",
    "init_train_state",
    "jit_train_step",
    "make_train_step",
]
