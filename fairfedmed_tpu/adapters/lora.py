"""LoRA / SVLoRA / FairLoRA adapters as functional layer transforms.

Semantics match the reference classes (trainers/GLP_OT_SVLoRA.py:203-500):

* ``LoRA``     — delta = ((x A) B) * alpha/rank; A zeros-init, B ~ N(0,1).
* ``SVLoRA``   — adds a rank-length singular-value vector S (linspace 1→0.1):
                 delta = ((x A) diag(S) B) * scaling.
* ``FairLoRA`` — S is per-demographic-group ``[num_groups, rank]``; each sample
                 selects a soft blend of group rows (λ=0.7 on its own group,
                 the rest uniform; uniform mix when attr is unknown).

TPU-first redesign: the reference materialises a ``[B, r, r]`` diagonal matrix
per sample via a Python loop of ``torch.diag`` (GLP_OT_SVLoRA.py:434,465); here
the same math is a broadcast multiply ``(x @ A) * s[:, None, :] @ B`` that XLA
fuses into the surrounding matmuls — no per-sample loop, no diag scatter.

Adapter parameters live in their own pytree (separate from the frozen backbone),
with leaf names containing ``lora_A/lora_S/lora_B`` so that federated
aggregation predicates (`'lora_S' in key`, utils/fed_utils.py:29,77) carry over.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

LORA_TYPES = ("LoRA", "SVLoRA", "FairLoRA")
LAMBDA_GROUP = 0.7  # soft one-hot weight on the sample's own group


def _s_init(rank: int, num_groups: int, init_type: str, dtype) -> jnp.ndarray:
    """Per-group singular-value init (GLP_OT_SVLoRA.py:394-417).

    ``same``        — every group gets linspace(1, 0.1, rank).
    ``cycle_shift`` — group g gets the linspace rolled by g*(rank//G).
    ``same+cycle``  — [shared linspace(0.5,0.1,rank/2) | rolled copy * 0.2]:
                      first half shared across groups, second half group-specific.
    """
    if init_type in ("same", "cycle_shift"):
        base = jnp.linspace(1.0, 0.1, rank, dtype=jnp.float32)
        if init_type == "same":
            s = jnp.tile(base[None], (num_groups, 1))
        else:
            assert rank >= num_groups
            step = rank // num_groups
            s = jnp.stack([jnp.roll(base, -g * step) for g in range(num_groups)])
    else:  # 'same+cycle' (the reference default)
        assert rank % 2 == 0 and rank >= num_groups
        half = rank // 2
        base = jnp.linspace(0.5, 0.1, half, dtype=jnp.float32)
        step = half // num_groups
        if step == 0:
            # rank/2 < num_groups: roll(base, 0) for EVERY group — the
            # per-group halves start identical and the fairness mechanism
            # begins fully degenerate.  The reference has the same silent
            # degeneracy (GLP_OT_SVLoRA.py:402-417), so warn, don't raise.
            print(f"WARNING: FairLoRA 'same+cycle' S-init is degenerate at "
                  f"rank {rank} with {num_groups} groups (rank/2 < groups): "
                  "all groups start with identical singular values")
        cycled = jnp.stack([jnp.roll(base, -g * step) for g in range(num_groups)])
        s = jnp.concatenate([jnp.tile(base[None], (num_groups, 1)), cycled * 0.2], axis=1)
    return s.astype(dtype)


def init_lora(
    rng: jax.Array,
    in_features: int,
    out_features: int,
    rank: int,
    lora_type: str = "FairLoRA",
    num_groups: int = 1,
    global_s: bool = False,
    s_init: str = "same+cycle",
    dtype=jnp.float32,
) -> dict:
    """Initialise one adapter's parameters.

    A is zeros (so delta starts at 0), B ~ N(0,1) — matching nn.Embedding default
    init used by the reference (GLP_OT_SVLoRA.py:230-236).
    """
    assert lora_type in LORA_TYPES, lora_type
    params = {
        "lora_A": jnp.zeros((in_features, rank), dtype=dtype),
        "lora_B": jax.random.normal(rng, (rank, out_features), dtype=jnp.float32).astype(dtype),
    }
    if lora_type == "SVLoRA":
        params["lora_S"] = jnp.linspace(1.0, 0.1, rank, dtype=jnp.float32).astype(dtype)
    elif lora_type == "FairLoRA":
        params["lora_S"] = _s_init(rank, num_groups, s_init, dtype)
    if global_s and lora_type in ("SVLoRA", "FairLoRA"):
        # [1, rank] like the reference's nn.Embedding(1, rank)
        # (GLP_OT_SVLoRA.py:419-421) — a bare [rank] vector would satisfy the
        # group-FedAvg predicate ('lora_S' in key and shape[0]==num_groups)
        # whenever rank equals the group count and get silently group-weighted
        params["lora_S_global"] = jnp.linspace(1.0, 0.1, rank, dtype=jnp.float32).astype(dtype)[None]
    return params


def group_mix(attr: Optional[jnp.ndarray], num_groups: int, batch: int, dtype) -> jnp.ndarray:
    """Soft one-hot over demographic groups, shape [batch, num_groups].

    λ=0.7 on the true group, (1-λ)/(G-1) elsewhere (GLP_OT_SVLoRA.py:461-465);
    uniform 1/G when attr is None.  Gradients do not flow through the mix
    (the reference computes it under no_grad).
    """
    if attr is None or num_groups == 1:
        return jnp.full((batch, num_groups), 1.0 / num_groups, dtype=dtype)
    one_hot = jax.nn.one_hot(attr, num_groups, dtype=dtype)
    mix = one_hot * LAMBDA_GROUP + (1.0 - one_hot) * (1.0 - LAMBDA_GROUP) / (num_groups - 1)
    return jax.lax.stop_gradient(mix)


def effective_s(lora: dict, attr_mix: Optional[jnp.ndarray], batch: int) -> Optional[jnp.ndarray]:
    """Per-sample singular values [batch, rank], or None for plain LoRA.

    Handles the 3D-OCT slice case: when the model batch is ``num_slices`` times
    the attribute batch, each sample's S vector is repeated across its slices
    (GLP_OT_SVLoRA.py:473-475).
    """
    if "lora_S" not in lora:
        return None
    s = lora["lora_S"]
    if s.ndim == 1:  # SVLoRA: one shared vector
        s = jnp.tile(s[None], (batch, 1))
    else:  # FairLoRA: [G, r] blended by the per-sample soft one-hot
        assert attr_mix is not None, "FairLoRA requires a group mix"
        s = attr_mix.astype(s.dtype) @ s  # [B_attr, r]
        if s.shape[0] != batch:
            num_slices = batch // s.shape[0]
            s = jnp.repeat(s, num_slices, axis=0)
    if "lora_S_global" in lora:
        # NOTE: the reference adds torch.diag(lora_S_global.weight) of a [1,r]
        # matrix — a degenerate broadcast.  We implement the intended semantics:
        # the global singular values add to the per-sample ones.
        s = s + lora["lora_S_global"].reshape(1, -1).astype(s.dtype)
    return s


def lora_delta(
    lora: dict,
    x: jnp.ndarray,
    attr_mix: Optional[jnp.ndarray],
    scaling: float,
) -> jnp.ndarray:
    """Adapter output delta for input ``x`` of shape [batch, ..., in_features].

    Equivalent to the reference einsum ``'nbr,brr->nbr'`` path
    (GLP_OT_SVLoRA.py:477-482) with the diag matmul replaced by a broadcast
    multiply over the rank axis.
    """
    a = lora["lora_A"].astype(x.dtype)
    b = lora["lora_B"].astype(x.dtype)
    h = x @ a  # [batch, ..., r]
    s = effective_s(lora, attr_mix, x.shape[0])
    if s is not None:
        s = s.astype(x.dtype).reshape(s.shape[0], *([1] * (x.ndim - 2)), s.shape[-1])
        h = h * s
    return (h @ b) * scaling


def materialized_weight(
    lora: dict,
    base_weight: jnp.ndarray,
    attr: Optional[jnp.ndarray],
    num_groups: int,
    scaling: float,
    batch: int,
) -> jnp.ndarray:
    """Per-sample effective weight [batch, out, in] — a reference-parity
    helper mirroring FairLoRALinear.weight (GLP_OT_SVLoRA.py:425-448, HARD
    one-hot rather than the λ=0.7 soft mix).  NOT used by the production
    forward (attention_pool applies lora_delta directly); kept for parity
    audits and tests."""
    if attr is None:
        mix = jnp.full((batch, num_groups), 1.0 / num_groups, dtype=jnp.float32)
    else:
        mix = jax.nn.one_hot(attr, num_groups, dtype=jnp.float32)
    a = lora["lora_A"].astype(jnp.float32)  # [in, r]
    b = lora["lora_B"].astype(jnp.float32)  # [r, out]
    if "lora_S" in lora:
        s = effective_s(lora, mix, batch)  # [B, r]
    else:  # plain LoRA: unit singular values
        s = jnp.ones((batch, a.shape[1]), jnp.float32)
    dw = jnp.einsum("ir,br,ro->boi", a, s.astype(jnp.float32), b) * scaling
    return base_weight[None].astype(jnp.float32) + dw
