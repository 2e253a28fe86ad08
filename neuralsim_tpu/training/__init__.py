"""Training: annealers, per-model optimizers, trainer, checkpointing.

``Trainer`` is imported lazily to break the losses <-> training import cycle
(losses need ``annealers``; the trainer needs losses).
"""
from .annealers import get_anneal_val, make_annealer
from .optimizers import make_optimizer, make_lr_schedule, current_lrs


def __getattr__(name):
    if name in ("Trainer", "TrainState", "psnr"):
        from . import trainer as _t
        return getattr(_t, name)
    raise AttributeError(name)
