import pytest

pytestmark = pytest.mark.smoke

import jax
import jax.numpy as jnp
import numpy as np

from fairfedmed_tpu.adapters import group_mix, init_lora, lora_delta


def test_zero_delta_at_init():
    rng = jax.random.PRNGKey(0)
    lora = init_lora(rng, 16, 32, rank=4, lora_type="FairLoRA", num_groups=3)
    x = jax.random.normal(jax.random.PRNGKey(1), (5, 7, 16))
    mix = group_mix(jnp.array([0, 1, 2, 0, 1]), 3, 5, jnp.float32)
    d = lora_delta(lora, x, mix, scaling=0.5)
    assert d.shape == (5, 7, 32)
    np.testing.assert_allclose(np.asarray(d), 0.0)  # A is zeros-init


def test_group_mix_soft_one_hot():
    mix = group_mix(jnp.array([1]), 3, 1, jnp.float32)
    np.testing.assert_allclose(np.asarray(mix)[0], [0.15, 0.7, 0.15], atol=1e-6)
    uni = group_mix(None, 4, 2, jnp.float32)
    np.testing.assert_allclose(np.asarray(uni), 0.25)


def test_s_init_same_plus_cycle():
    rng = jax.random.PRNGKey(0)
    lora = init_lora(rng, 8, 8, rank=12, lora_type="FairLoRA", num_groups=3, s_init="same+cycle")
    s = np.asarray(lora["lora_S"], np.float32)
    assert s.shape == (3, 12)
    # first half identical across groups, second half is a scaled cycle
    assert (s[:, :6] == s[0:1, :6]).all()
    base = np.linspace(0.5, 0.1, 6, dtype=np.float32)
    np.testing.assert_allclose(s[0, :6], base, atol=1e-6)
    np.testing.assert_allclose(s[0, 6:], base * 0.2, atol=1e-6)
    np.testing.assert_allclose(s[1, 6:], np.roll(base, -2) * 0.2, atol=1e-6)


def test_fairlora_matches_reference_einsum():
    """Check the broadcast form equals the reference's per-sample diag matmul."""
    rng = np.random.default_rng(0)
    B, L, Din, Dout, r, G = 3, 4, 8, 6, 4, 3
    A = rng.normal(size=(Din, r)).astype(np.float32)
    Bm = rng.normal(size=(r, Dout)).astype(np.float32)
    S = rng.normal(size=(G, r)).astype(np.float32)
    x = rng.normal(size=(B, L, Din)).astype(np.float32)
    attr = np.array([0, 2, 1])
    scaling = 2.0 / r

    lam = 0.7
    one_hot = np.eye(G, dtype=np.float32)[attr]
    mix = one_hot * lam + (1 - one_hot) * (1 - lam) / (G - 1)
    s = mix @ S  # [B, r]
    # reference computes dy = einsum('nbr,brr->nbr', x@A, diag(s)) @ B * scaling
    # with n=tokens, b=batch; transcribe with batch-first layout:
    ref = np.einsum("blr,r...->blr", x @ A, np.zeros(0))[0:0] if False else None
    diag = np.stack([np.diag(v) for v in s])  # [B, r, r]
    h = np.einsum("blr,brk->blk", x @ A, diag)
    ref = (h @ Bm) * scaling

    lora = {"lora_A": jnp.asarray(A), "lora_B": jnp.asarray(Bm), "lora_S": jnp.asarray(S)}
    got = lora_delta(lora, jnp.asarray(x), jnp.asarray(mix), scaling)
    np.testing.assert_allclose(np.asarray(got), ref, rtol=1e-5, atol=1e-6)


def test_slice_repeat_for_3d():
    """When batch = attr_batch * num_slices, S repeats per slice
    (GLP_OT_SVLoRA.py:473-475)."""
    rng = jax.random.PRNGKey(3)
    G, r = 2, 4
    lora = init_lora(rng, 8, 8, rank=r, lora_type="FairLoRA", num_groups=G, s_init="cycle_shift")
    lora = {**lora, "lora_A": jnp.ones((8, r))}  # make delta non-zero
    attr = jnp.array([0, 1])
    mix = group_mix(attr, G, 2, jnp.float32)
    x = jnp.ones((6, 5, 8))  # 2 samples x 3 slices
    d = lora_delta(lora, x, mix, scaling=1.0)
    d = np.asarray(d)
    # slices of the same sample share S → identical deltas
    np.testing.assert_allclose(d[0], d[1])
    np.testing.assert_allclose(d[3], d[5])
    assert not np.allclose(d[0], d[3])  # different groups differ
