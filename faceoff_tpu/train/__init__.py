from faceoff_tpu.train.state import TrainState, create_train_state
from faceoff_tpu.train.train_step import make_train_step, make_eval_step

__all__ = [
    "TrainState",
    "create_train_state",
    "make_train_step",
    "make_eval_step",
]
