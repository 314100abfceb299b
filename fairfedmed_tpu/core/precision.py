"""Mixed-precision policy.

The reference stores CLIP weights in fp16 with fp32 LayerNorm islands
(clip/model.py:609-630, 304-310) and exposes PREC ∈ {fp16, fp32, amp}
(trainers/GLP_OT_SVLoRA.py:773).  On TPU the idiomatic match for fp16 is
bfloat16: matmuls land on the MXU in bf16 with fp32 accumulation; LayerNorm,
softmax and the loss stay fp32.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class Policy:
    param_dtype: jnp.dtype  # storage dtype of (frozen) backbone weights
    compute_dtype: jnp.dtype  # matmul input dtype
    norm_dtype: jnp.dtype = jnp.float32  # LayerNorm / softmax / loss dtype

    def cast_compute(self, x):
        return x.astype(self.compute_dtype)

    def cast_norm(self, x):
        return x.astype(self.norm_dtype)


def policy_from_prec(prec: str) -> Policy:
    """Map the reference PREC strings onto TPU dtypes.

    fp16 → bf16 storage+compute (the TPU-native analogue);
    fp32/amp → fp32 storage, bf16 compute for amp, fp32 otherwise.
    """
    if prec == "fp16":
        return Policy(param_dtype=jnp.bfloat16, compute_dtype=jnp.bfloat16)
    if prec == "amp":
        return Policy(param_dtype=jnp.float32, compute_dtype=jnp.bfloat16)
    if prec == "fp32":
        return Policy(param_dtype=jnp.float32, compute_dtype=jnp.float32)
    raise ValueError(f"Unknown precision {prec!r} (expected fp16/fp32/amp)")
