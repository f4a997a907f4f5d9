from faceoff_tpu.train.state import TrainState, create_train_state
from faceoff_tpu.train.train_step import (
    make_eval_step,
    make_multi_step,
    make_train_step,
)

__all__ = [
    "TrainState",
    "create_train_state",
    "make_train_step",
    "make_multi_step",
    "make_eval_step",
]
