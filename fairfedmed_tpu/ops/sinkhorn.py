"""Entropic optimal transport under jit.

Reference implementations (trainers/GLP_OT_SVLoRA.py:615-675) run data-dependent
Python loops with a host-synced ``err.item()`` early exit, entirely under
``torch.no_grad()``.  Here both solvers are ``lax.while_loop`` fixed-point
iterations — no host syncs, one compiled program — with the transport plan
wrapped in ``stop_gradient`` (same semantics as the reference's no_grad).

NaN handling: instead of aborting the step (the reference returns None from
forward, GLP_OT_SVLoRA.py:738-743), we return a validity flag alongside a
NaN-scrubbed plan so callers can mask the update under jit.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def sinkhorn(
    K: jnp.ndarray,
    u: jnp.ndarray,
    v: jnp.ndarray,
    thresh: float = 1e-3,
    max_iter: int = 100,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Balanced entropic OT scaling iterations.

    K: [B, M, N] Gibbs kernel exp(-cost/eps); u: [B, M]; v: [B, N] marginals.
    Returns (plan T [B, M, N], valid flag).  Matches Sinkhorn
    (GLP_OT_SVLoRA.py:615-634): r ← u / (K c), c ← v / (Kᵀ r), stop when the
    mean |Δr| over the whole batch drops below ``thresh``.
    """
    K = K.astype(jnp.float32)
    u = u.astype(jnp.float32)
    v = v.astype(jnp.float32)

    def cond(carry):
        _, _, err, i = carry
        return jnp.logical_and(i < max_iter, err >= thresh)

    def body(carry):
        r, c, _, i = carry
        r0 = r
        r = u / jnp.einsum("bmn,bn->bm", K, c)
        c = v / jnp.einsum("bmn,bm->bn", K, r)
        err = jnp.abs(r - r0).mean()
        return r, c, err, i + 1

    r0 = jnp.ones_like(u)
    c0 = jnp.ones_like(v)
    r, c, _, _ = jax.lax.while_loop(cond, body, (r0, c0, jnp.inf, 0))
    T = r[:, :, None] * c[:, None, :] * K
    # isfinite, not just not-NaN: nan_to_num also CLAMPS +/-inf to 3.4e38,
    # so an overflowed plan (r*c in fp32) would otherwise be reported valid
    # and train on garbage instead of triggering the caller's skip machinery
    valid = jnp.all(jnp.isfinite(T))
    T = jnp.nan_to_num(T)
    return jax.lax.stop_gradient(T), valid


def entropic_cot(
    K: jnp.ndarray,
    a: jnp.ndarray,
    b: jnp.ndarray,
    max_iter: int = 100,
    thresh: float = 1e-3,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Unbalanced/partial entropic OT (entropic_COT_fast,
    GLP_OT_SVLoRA.py:636-675, itself modified from
    ot.partial.entropic_partial_wasserstein).

    a: [B, M] source marginal; b: [B, N] target marginal (already scaled by
    top_percent); K: [B, M, N] Gibbs kernel.  u is capped at dx:
    u ← min(dx / (Kp v), dx); v ← dy / (Kq u); plan = diag(u) K diag(v).
    """
    K = K.astype(jnp.float32)
    a = a.astype(jnp.float32)
    b = b.astype(jnp.float32)
    dx = jnp.ones_like(a)
    dy = jnp.ones_like(b)
    Kp = K / a[:, :, None]          # diag(1/a) @ K
    Kq = K.transpose(0, 2, 1) / b[:, :, None]  # diag(1/b) @ K^T

    def cond(carry):
        _, _, err, i = carry
        return jnp.logical_and(i < max_iter, err >= thresh)

    def body(carry):
        u, v, _, i = carry
        v0 = v
        u = jnp.minimum(dx / jnp.einsum("bmn,bn->bm", Kp, v), dx)
        v = dy / jnp.einsum("bnm,bm->bn", Kq, u)
        err = jnp.abs(v - v0).mean()
        return u, v, err, i + 1

    u, v, _, _ = jax.lax.while_loop(cond, body, (dx, dy, jnp.inf, 0))
    T = u[:, :, None] * K * v[:, None, :]
    # isfinite, not just not-NaN: nan_to_num also CLAMPS +/-inf to 3.4e38,
    # so an overflowed plan (r*c in fp32) would otherwise be reported valid
    # and train on garbage instead of triggering the caller's skip machinery
    valid = jnp.all(jnp.isfinite(T))
    T = jnp.nan_to_num(T)
    return jax.lax.stop_gradient(T), valid
