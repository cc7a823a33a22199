from stylex_tpu.train.state import StylExTrainState, create_train_state, make_optimizers
from stylex_tpu.train.steps import make_train_step, microbatch_schedule
from stylex_tpu.train.trainer import Trainer, NanException, ModelLoader

__all__ = [
    "StylExTrainState",
    "create_train_state",
    "make_optimizers",
    "make_train_step",
    "microbatch_schedule",
    "Trainer",
    "NanException",
    "ModelLoader",
]
