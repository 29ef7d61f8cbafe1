from .evaluator import Evaluator, MetricsTracker
from .losses import (
    combined_loss,
    contrastive_loss,
    cross_entropy_loss,
    focal_loss,
    label_smoothing_loss,
    make_criterion,
    triplet_loss,
)
from .optim import (
    ConstantLR,
    CosineAnnealingLR,
    CosineAnnealingWarmRestarts,
    LRScheduler,
    ReduceLROnPlateau,
    StepLR,
    create_optimizer,
    create_scheduler,
    get_learning_rate,
    set_learning_rate,
)
from .detection import detection_loss, make_detector_train_step
from .optim import create_optimizer_with_param_groups
from .train_state import TrainState, make_eval_step, make_train_step
from .trainer import Trainer, restore_train_state

__all__ = [
    "ConstantLR",
    "CosineAnnealingLR",
    "CosineAnnealingWarmRestarts",
    "Evaluator",
    "LRScheduler",
    "MetricsTracker",
    "ReduceLROnPlateau",
    "StepLR",
    "TrainState",
    "Trainer",
    "combined_loss",
    "contrastive_loss",
    "create_optimizer",
    "create_optimizer_with_param_groups",
    "create_scheduler",
    "detection_loss",
    "make_detector_train_step",
    "cross_entropy_loss",
    "focal_loss",
    "get_learning_rate",
    "label_smoothing_loss",
    "make_criterion",
    "make_eval_step",
    "make_train_step",
    "restore_train_state",
    "set_learning_rate",
    "triplet_loss",
]
