from .train_step import (
    TrainStepOutput,
    build_optimizer,
    make_train_step,
    reset_unused_codebooks,
)

__all__ = [
    "build_optimizer",
    "make_train_step",
    "reset_unused_codebooks",
    "TrainStepOutput",
]
