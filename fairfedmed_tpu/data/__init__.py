from . import datasets  # noqa: F401  (registers DATASET_REGISTRY entries)
from .base import (
    Datum, DatasetBase, assign_classes_to_users, generate_federated_dataset,
    generate_federated_fewshot_dataset, generate_fewshot_dataset,
)
from .manager import ClientLoader, DataManager, build_dataset, prefetch_to_device
from .partition import partition_indices, record_class_counts
from .transforms import build_transform

__all__ = [
    "Datum",
    "DatasetBase",
    "generate_fewshot_dataset",
    "generate_federated_fewshot_dataset",
    "generate_federated_dataset",
    "assign_classes_to_users",
    "ClientLoader",
    "DataManager",
    "build_dataset",
    "prefetch_to_device",
    "partition_indices",
    "record_class_counts",
    "build_transform",
]
