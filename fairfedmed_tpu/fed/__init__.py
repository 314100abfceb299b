from .aggregate import (
    average_weights,
    average_weights_ema,
    fedprox_penalty,
    shared_half_s_transform,
)
from .sampler import sample_clients

__all__ = [
    "average_weights",
    "average_weights_ema",
    "shared_half_s_transform",
    "fedprox_penalty",
    "sample_clients",
]
