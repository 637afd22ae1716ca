from plangen_tpu.train.loss import (
    shift_cross_entropy,
    uni_loss,
    mmu_loss,
    plan_loss,
    t2i_loss,
)
from plangen_tpu.train.step import make_train_step, TrainState

__all__ = [
    "shift_cross_entropy",
    "uni_loss",
    "mmu_loss",
    "plan_loss",
    "t2i_loss",
    "make_train_step",
    "TrainState",
]
