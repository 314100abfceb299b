import pytest

pytestmark = pytest.mark.smoke

import jax.numpy as jnp
import numpy as np

from fairfedmed_tpu.ops import entropic_cot, sinkhorn


def _gibbs(rng, b, m, n, eps=0.1):
    sim = rng.uniform(0, 1, size=(b, m, n)).astype(np.float32)
    return jnp.exp(-(1.0 - jnp.asarray(sim)) / eps)


def test_sinkhorn_marginals():
    rng = np.random.default_rng(0)
    b, m, n = 4, 16, 3
    K = _gibbs(rng, b, m, n)
    u = jnp.full((b, m), 1.0 / m)
    v = jnp.full((b, n), 1.0 / n)
    T, valid = sinkhorn(K, u, v, thresh=1e-6, max_iter=500)
    assert bool(valid)
    np.testing.assert_allclose(np.asarray(T.sum(-1)), np.asarray(u), atol=1e-4)
    np.testing.assert_allclose(np.asarray(T.sum(-2)), np.asarray(v), atol=1e-4)


def test_sinkhorn_matches_reference_loop():
    """Cross-check the while_loop against a plain numpy transcription of the
    reference iteration (GLP_OT_SVLoRA.py:615-634)."""
    rng = np.random.default_rng(1)
    b, m, n = 2, 8, 2
    K = np.asarray(_gibbs(rng, b, m, n))
    u = np.full((b, m), 1.0 / m, np.float32)
    v = np.full((b, n), 1.0 / n, np.float32)

    r = np.ones_like(u)
    c = np.ones_like(v)
    for _ in range(100):
        r0 = r
        r = u / np.einsum("bmn,bn->bm", K, c)
        c = v / np.einsum("bmn,bm->bn", K, r)
        if np.abs(r - r0).mean() < 1e-3:
            break
    T_ref = r[:, :, None] * c[:, None, :] * K

    T, _ = sinkhorn(jnp.asarray(K), jnp.asarray(u), jnp.asarray(v), thresh=1e-3, max_iter=100)
    np.testing.assert_allclose(np.asarray(T), T_ref, rtol=1e-4, atol=1e-6)


def test_cot_mass_cap_and_reference_loop():
    rng = np.random.default_rng(2)
    b, m, n = 2, 10, 2
    K = np.asarray(_gibbs(rng, b, m, n))
    a = np.full((b, m), 1.0 / m, np.float32)
    top_percent = 0.8
    bb = np.full((b, n), 1.0 / n, np.float32) * top_percent

    # numpy transcription of entropic_COT_fast (GLP_OT_SVLoRA.py:636-675)
    dx, dy = np.ones_like(a), np.ones_like(bb)
    Kp = K / a[:, :, None]
    Kq = K.transpose(0, 2, 1) / bb[:, :, None]
    u, v = dx.copy(), dy.copy()
    for _ in range(100):
        v0 = v
        u = np.minimum(dx / np.einsum("bmn,bn->bm", Kp, v), dx)
        v = dy / np.einsum("bnm,bm->bn", Kq, u)
        if np.abs(v - v0).mean() < 1e-3:
            break
    T_ref = u[:, :, None] * K * v[:, None, :]

    T, valid = entropic_cot(jnp.asarray(K), jnp.asarray(a), jnp.asarray(bb), max_iter=100, thresh=1e-3)
    assert bool(valid)
    np.testing.assert_allclose(np.asarray(T), T_ref, rtol=1e-4, atol=1e-6)


def test_nan_flag():
    K = jnp.zeros((1, 4, 2))  # division by zero → nan plan
    u = jnp.full((1, 4), 0.25)
    v = jnp.full((1, 2), 0.5)
    T, valid = sinkhorn(K, u, v)
    assert not bool(valid)
    assert np.isfinite(np.asarray(T)).all()
