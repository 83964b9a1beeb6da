from .evaluator import check_expected_results, evaluate
from .train import TrainState, build_train_step, create_train_state, train

__all__ = [
    "TrainState",
    "build_train_step",
    "create_train_state",
    "train",
    "evaluate",
    "check_expected_results",
]
