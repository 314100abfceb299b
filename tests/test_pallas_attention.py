"""Pallas fused attention vs the XLA einsum reference (ops/attention.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fairfedmed_tpu.ops.attention import flash_attention, reference_attention


@pytest.fixture
def qkv():
    rng = np.random.default_rng(0)
    return tuple(jnp.asarray(rng.standard_normal((2, 3, 197, 64)), jnp.float32)
                 for _ in range(3))


def test_forward_parity(qkv):
    q, k, v = qkv
    out = flash_attention(q, k, v, interpret=True)
    ref = reference_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_forward_parity_causal_mask():
    rng = np.random.default_rng(1)
    q, k, v = (jnp.asarray(rng.standard_normal((2, 2, 77, 64)), jnp.float32)
               for _ in range(3))
    mask = jnp.triu(jnp.full((77, 77), -jnp.inf), k=1)
    out = flash_attention(q, k, v, mask, interpret=True)
    ref = reference_attention(q, k, v, mask)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_gradient_parity(qkv):
    q, k, v = qkv
    gp = jax.grad(lambda q, k, v: (flash_attention(q, k, v, interpret=True) ** 2).sum(),
                  argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(lambda q, k, v: (reference_attention(q, k, v) ** 2).sum(),
                  argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gp, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4)


def test_jit_and_nonaligned_length():
    rng = np.random.default_rng(2)
    q, k, v = (jnp.asarray(rng.standard_normal((1, 1, 50, 64)), jnp.float32)
               for _ in range(3))
    f = jax.jit(lambda q, k, v: flash_attention(q, k, v, interpret=True))
    np.testing.assert_allclose(np.asarray(f(q, k, v)),
                               np.asarray(reference_attention(q, k, v)), atol=2e-5)


def test_model_attention_env_toggle(monkeypatch):
    import fairfedmed_tpu.models.clip_model as cm

    monkeypatch.setattr(cm, "_PALLAS_ATTN", None)
    monkeypatch.setenv("FFM_PALLAS_ATTN", "0")
    assert cm._use_pallas_attn() is False
    monkeypatch.setattr(cm, "_PALLAS_ATTN", None)
    monkeypatch.setenv("FFM_PALLAS_ATTN", "1")
    assert cm._use_pallas_attn() is True
    monkeypatch.setattr(cm, "_PALLAS_ATTN", None)
