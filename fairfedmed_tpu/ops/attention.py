"""Fused multi-head attention as a Pallas TPU kernel.

The reference's attention is torch ``nn.MultiheadAttention`` inside fp16 CLIP
(clip/model.py:335-357); under XLA the unfused chain materializes the
``[B, H, L, L]`` score tensor in HBM twice (softmax fwd + bwd).  CLIP
sequences are short (197 image patches / 77 text tokens), so one (batch,
head) pair's whole Q/K/V and score matrix fit comfortably in VMEM: the kernel
runs grid=(B·H,), holds the scores as kernel-local VMEM values (no explicit
scratch allocation), and writes only the [L, dh] output — HBM traffic drops
from O(L²) to O(L·dh) per head.

Backward uses the same full-block strategy via jax.custom_vjp: recompute
scores/softmax in-kernel, then dV = Pᵀ·dO, dP = dO·Vᵀ,
dS = P∘(dP − rowsum(dP∘P)), dQ = dS·K, dK = dSᵀ·Q.

``flash_attention`` pads L up to a lane-friendly multiple and masks the tail
with −∞ before softmax, so padded rows/cols contribute nothing.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -1e30


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _fwd_kernel(q_ref, k_ref, v_ref, mask_ref, o_ref):
    """One (batch·head) program: full-length attention in VMEM."""
    q = q_ref[0].astype(jnp.float32)  # [Lp, dh]
    k = k_ref[0].astype(jnp.float32)
    v = v_ref[0].astype(jnp.float32)
    s = jax.lax.dot_general(q, k, dimension_numbers=(((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    s = s + mask_ref[0]  # additive mask already includes padding -inf
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - m)
    denom = jnp.sum(e, axis=-1, keepdims=True)
    p = e / denom
    o_ref[0] = jax.lax.dot_general(
        p, v, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(o_ref.dtype)


def _bwd_kernel(q_ref, k_ref, v_ref, mask_ref, do_ref, dq_ref, dk_ref, dv_ref):
    q = q_ref[0].astype(jnp.float32)
    k = k_ref[0].astype(jnp.float32)
    v = v_ref[0].astype(jnp.float32)
    do = do_ref[0].astype(jnp.float32)
    s = jax.lax.dot_general(q, k, dimension_numbers=(((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    s = s + mask_ref[0]
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - m)
    p = e / jnp.sum(e, axis=-1, keepdims=True)
    # dV = Pᵀ · dO
    dv_ref[0] = jax.lax.dot_general(
        p, do, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(dv_ref.dtype)
    # dP = dO · Vᵀ ; dS = P ∘ (dP − rowsum(dP ∘ P))
    dp = jax.lax.dot_general(do, v, dimension_numbers=(((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
    dq_ref[0] = jax.lax.dot_general(
        ds, k, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(dq_ref.dtype)
    dk_ref[0] = jax.lax.dot_general(
        ds, q, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(dk_ref.dtype)


def _specs(lp, dh, n):
    bs = lambda: pl.BlockSpec((1, lp, dh), lambda i: (i, 0, 0),
                              memory_space=pltpu.VMEM)
    mask_spec = pl.BlockSpec((1, lp, lp), lambda i: (0, 0, 0),
                             memory_space=pltpu.VMEM)
    return [bs(), bs(), bs(), mask_spec][:n], bs()


def _pad_qkv(q, k, v, L, lp):
    pad = [(0, 0), (0, lp - L), (0, 0)]
    return (jnp.pad(q, pad), jnp.pad(k, pad), jnp.pad(v, pad))


def _build_mask(mask, L, lp, dtype=jnp.float32):
    """[1, Lp, Lp] additive mask combining the user mask and padding."""
    full = jnp.zeros((lp, lp), dtype)
    if mask is not None:
        full = full.at[:L, :L].add(mask.astype(dtype))
    if lp > L:
        full = full.at[:, L:].set(_NEG_INF)
        # padded query rows get a uniform valid distribution (output sliced off)
    return full[None]


def _attend_impl(qf, kf, vf, maskf, lp, interpret):
    n, _, dh = qf.shape
    in_specs, out_spec = _specs(lp, dh, 4)
    return pl.pallas_call(
        _fwd_kernel,
        grid=(n,),
        in_specs=in_specs,
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((n, lp, dh), qf.dtype),
        interpret=interpret,
    )(qf, kf, vf, maskf)


def _attend_bwd_impl(qf, kf, vf, maskf, do, lp, interpret):
    n, _, dh = qf.shape
    in_specs, out_spec = _specs(lp, dh, 4)
    in_specs = in_specs + [out_spec]
    dq, dk, dv = pl.pallas_call(
        _bwd_kernel,
        grid=(n,),
        in_specs=in_specs,
        out_specs=(out_spec, out_spec, out_spec),
        out_shape=(jax.ShapeDtypeStruct((n, lp, dh), qf.dtype),) * 3,
        interpret=interpret,
    )(qf, kf, vf, maskf, do)
    return dq, dk, dv


def flash_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                    mask: Optional[jnp.ndarray] = None,
                    scale: Optional[float] = None,
                    interpret: bool = False) -> jnp.ndarray:
    """Fused attention.  q/k/v: [B, H, L, dh]; mask: additive [L, L] or None.

    Scaling (dh^-0.5 by default) is folded into q before the kernel.
    Differentiable via custom VJP; gradients flow to q, k, v (mask is
    constant, matching CLIP's fixed causal mask).
    """
    b, h, L, dh = q.shape
    scale = dh ** -0.5 if scale is None else scale
    lp = max(_round_up(L, 128), 128)
    q = (q * jnp.asarray(scale, q.dtype)).reshape(b * h, L, dh)
    k = k.reshape(b * h, L, dh)
    v = v.reshape(b * h, L, dh)
    qf, kf, vf = _pad_qkv(q, k, v, L, lp)
    maskf = _build_mask(mask, L, lp)
    out = _attend(qf, kf, vf, maskf, lp, interpret)[:, :L]
    return out.reshape(b, h, L, dh)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def _attend(qf, kf, vf, maskf, lp, interpret):
    return _attend_impl(qf, kf, vf, maskf, lp, interpret)


def _attend_fwd(qf, kf, vf, maskf, lp, interpret):
    return _attend_impl(qf, kf, vf, maskf, lp, interpret), (qf, kf, vf, maskf)


def _attend_bwd(lp, interpret, res, do):
    qf, kf, vf, maskf = res
    dq, dk, dv = _attend_bwd_impl(qf, kf, vf, maskf, do, lp, interpret)
    return dq, dk, dv, jnp.zeros_like(maskf)


_attend.defvjp(_attend_fwd, _attend_bwd)


def reference_attention(q, k, v, mask=None, scale=None):
    """Unfused einsum attention (the XLA path) for parity checks."""
    dh = q.shape[-1]
    scale = dh ** -0.5 if scale is None else scale
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                   preferred_element_type=jnp.float32) * scale
    if mask is not None:
        s = s + mask.astype(s.dtype)
    p = jax.nn.softmax(s, axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", p, v,
                      preferred_element_type=jnp.float32).astype(q.dtype)
