from .checkpoint import (
    latest_checkpoint,
    latest_step,
    load_pretrained,
    overlay_compatible,
    restore_variables,
)
from .evaluator import (
    check_expected_results,
    evaluate,
    evaluate_panoptic,
    evaluate_sem_seg,
    run_evaluation,
)
from .train import TrainState, build_train_step, create_train_state, train

__all__ = [
    "TrainState",
    "build_train_step",
    "create_train_state",
    "train",
    "evaluate",
    "evaluate_panoptic",
    "evaluate_sem_seg",
    "run_evaluation",
    "check_expected_results",
    "load_pretrained",
    "restore_variables",
    "overlay_compatible",
    "latest_checkpoint",
    "latest_step",
]
