from . import trainers  # noqa: F401  (registers TRAINER_REGISTRY entries)
from .engine import SimpleTrainer, TrainerBase, TrainerX, build_trainer
from .optim import LRSchedule, build_lr_scheduler, build_optimizer, get_learning_rate, set_learning_rate

__all__ = [
    "TrainerBase",
    "SimpleTrainer",
    "TrainerX",
    "build_trainer",
    "build_optimizer",
    "build_lr_scheduler",
    "LRSchedule",
    "set_learning_rate",
    "get_learning_rate",
]
