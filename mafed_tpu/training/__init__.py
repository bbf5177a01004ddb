from mafed_tpu.training.train_state import TrainState, merge_params, split_params
from mafed_tpu.training.step import (
    make_train_step,
    make_distill_step,
    make_ewc_fisher_fn,
    make_adaptive_weights_fn,
)

__all__ = [
    "TrainState",
    "merge_params",
    "split_params",
    "make_train_step",
    "make_distill_step",
    "make_ewc_fisher_fn",
    "make_adaptive_weights_fn",
]
