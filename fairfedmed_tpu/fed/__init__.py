from .dist import (
    get_local_device_count, get_rank, get_world_size, is_main_process,
)
from .aggregate import (
    average_weights,
    average_weights_ema,
    fedprox_penalty,
    shared_half_s_transform,
)
from .sampler import sample_clients

__all__ = [
    "get_world_size",
    "get_rank",
    "get_local_device_count",
    "is_main_process",
    "average_weights",
    "average_weights_ema",
    "shared_half_s_transform",
    "fedprox_penalty",
    "sample_clients",
]
