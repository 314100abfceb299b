from .lora import (
    LAMBDA_GROUP,
    LORA_TYPES,
    effective_s,
    group_mix,
    init_lora,
    lora_delta,
    materialized_weight,
)

__all__ = [
    "LAMBDA_GROUP",
    "LORA_TYPES",
    "init_lora",
    "group_mix",
    "effective_s",
    "lora_delta",
    "materialized_weight",
]
