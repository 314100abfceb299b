from .logger import Logger, setup_logger
from .meters import AverageMeter, MetricMeter
from .registry import (
    BACKBONE_REGISTRY,
    DATASET_REGISTRY,
    EVALUATOR_REGISTRY,
    TRAINER_REGISTRY,
    Registry,
)
from .tools import ascii_table, count_parameters, mkdir_if_missing, set_random_seed

__all__ = [
    "Logger",
    "setup_logger",
    "AverageMeter",
    "MetricMeter",
    "Registry",
    "TRAINER_REGISTRY",
    "DATASET_REGISTRY",
    "EVALUATOR_REGISTRY",
    "BACKBONE_REGISTRY",
    "ascii_table",
    "count_parameters",
    "mkdir_if_missing",
    "set_random_seed",
]
