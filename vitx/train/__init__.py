from vitx.train.step import (
    TrainState,
    create_train_state,
    cross_entropy_loss,
    make_eval_step,
    make_train_step,
)

__all__ = [
    "TrainState",
    "create_train_state",
    "cross_entropy_loss",
    "make_train_step",
    "make_eval_step",
]
