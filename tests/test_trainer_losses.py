"""Trainer-level loss components: fairness regulariser + FedProx penalty."""

import jax
import jax.numpy as jnp
import numpy as np

from fairfedmed_tpu.train.clip_common import cross_entropy, fairness_confidence_loss


def _batch():
    rng = np.random.default_rng(0)
    logits = jnp.asarray(rng.standard_normal((12, 2)), jnp.float32)
    labels = jnp.asarray(rng.integers(0, 2, 12), jnp.int32)
    attr = jnp.asarray(rng.integers(0, 3, 12), jnp.int32)
    return logits, labels, attr


def test_fairness_loss_value_matches_manual():
    logits, labels, attr = _batch()
    loss = float(fairness_confidence_loss(logits, labels, attr, 3,
                                          differentiable=True))
    probs = np.asarray(jax.nn.softmax(logits, -1))
    correct = probs[np.arange(12), np.asarray(labels)]
    confs = []
    for g in range(3):
        m = np.asarray(attr) == g
        if m.any():
            confs.append(1.0 - correct[m].mean())
    confs = np.asarray(confs)
    expected = np.abs(confs - confs.mean()).mean()
    assert abs(loss - expected) < 1e-6


def test_fairness_loss_detached_reproduces_reference_quirk():
    """GLP_OT_SVLoRA.py:924,:943 builds the group vector via
    torch.tensor(list(...)) which detaches it — zero gradient."""
    logits, labels, attr = _batch()

    def detached(lg):
        return fairness_confidence_loss(lg, labels, attr, 3, differentiable=False)

    def live(lg):
        return fairness_confidence_loss(lg, labels, attr, 3, differentiable=True)

    g_detached = jax.grad(detached)(logits)
    g_live = jax.grad(live)(logits)
    assert float(jnp.abs(g_detached).max()) == 0.0
    assert float(jnp.abs(g_live).max()) > 0.0


def test_fairness_loss_single_group_is_zero():
    logits, labels, _ = _batch()
    attr = jnp.zeros((12,), jnp.int32)
    loss = float(fairness_confidence_loss(logits, labels, attr, 3,
                                          differentiable=True))
    assert loss == 0.0


def test_fedprox_penalty_pulls_ctx_toward_global():
    """loss += (mu/2)||ctx - ctx_global||^2 (promptfl.py:290-293): gradient
    of the penalty is mu*(ctx - global)."""
    mu = 0.5
    ctx = jnp.asarray(np.random.default_rng(1).standard_normal((2, 4, 8)), jnp.float32)
    ctx_global = jnp.zeros_like(ctx)

    def penalty(c):
        return 0.5 * mu * jnp.sum((c - ctx_global) ** 2)

    g = jax.grad(penalty)(ctx)
    np.testing.assert_allclose(np.asarray(g), mu * np.asarray(ctx), rtol=1e-6)


def test_cross_entropy_matches_manual():
    logits, labels, _ = _batch()
    loss = float(cross_entropy(logits, labels))
    p = np.asarray(jax.nn.log_softmax(logits, -1))
    expected = -p[np.arange(12), np.asarray(labels)].mean()
    assert abs(loss - expected) < 1e-6
