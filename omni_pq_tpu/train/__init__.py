from .state import TrainState, OptimizerConfig, make_optimizer, create_train_state
from .step import (TrainFlags, make_train_step, make_eval_step,
                   make_eval_decode_step, unpack_eval_outputs)
from .schedule import warmup_cosine, consistency_weight
from .checkpoint import save_checkpoint, load_checkpoint

__all__ = [
    "TrainState", "OptimizerConfig", "make_optimizer", "create_train_state",
    "TrainFlags", "make_train_step", "make_eval_step",
    "make_eval_decode_step", "unpack_eval_outputs", "warmup_cosine",
    "consistency_weight", "save_checkpoint", "load_checkpoint",
]
