from streamyolo_tpu.train.lr import build_lr_schedule, yolox_warm_cos_lr
from streamyolo_tpu.train.optimizer import sgd_optimizer
from streamyolo_tpu.train.step import (
    TrainState,
    create_train_state,
    jit_train_step,
    make_train_step,
)

__all__ = [
    "build_lr_schedule",
    "yolox_warm_cos_lr",
    "sgd_optimizer",
    "TrainState",
    "create_train_state",
    "jit_train_step",
    "make_train_step",
]
