import pytest

pytestmark = pytest.mark.smoke

import jax.numpy as jnp
import numpy as np
import optax

from fairfedmed_tpu.config import get_cfg_default
from fairfedmed_tpu.train.optim import (
    build_lr_scheduler,
    build_optimizer,
    get_learning_rate,
    set_learning_rate,
)


def _optim_cfg(**kw):
    c = get_cfg_default().OPTIM
    for k, v in kw.items():
        c[k] = v
    return c


def test_single_step_schedule():
    sched = build_lr_scheduler(_optim_cfg(LR=0.1, LR_SCHEDULER="single_step",
                                          STEPSIZE=(10,), GAMMA=0.5, MAX_EPOCH=30))
    assert sched.lr(0) == 0.1
    assert sched.lr(9) == 0.1
    assert abs(sched.lr(10) - 0.05) < 1e-12
    assert abs(sched.lr(20) - 0.025) < 1e-12


def test_single_step_negative_stepsize_uses_max_epoch():
    sched = build_lr_scheduler(_optim_cfg(LR=0.1, STEPSIZE=(-1,), MAX_EPOCH=5, GAMMA=0.1))
    assert sched.lr(4) == 0.1
    assert abs(sched.lr(5) - 0.01) < 1e-12


def test_cosine_schedule():
    sched = build_lr_scheduler(_optim_cfg(LR=1.0, LR_SCHEDULER="cosine", MAX_EPOCH=10))
    assert abs(sched.lr(0) - 1.0) < 1e-12
    assert abs(sched.lr(5) - 0.5) < 1e-12
    assert sched.lr(10) < 1e-12


def test_warmup_constant():
    sched = build_lr_scheduler(_optim_cfg(LR=0.1, WARMUP_EPOCH=2, WARMUP_TYPE="constant",
                                          WARMUP_CONS_LR=1e-5, STEPSIZE=(100,), MAX_EPOCH=50))
    assert sched.lr(0) == 1e-5
    assert sched.lr(1) == 1e-5
    assert sched.lr(2) == 0.1


def test_sgd_matches_torch_semantics():
    """optax sgd+add_decayed_weights == torch SGD with momentum+weight_decay."""
    cfg = _optim_cfg(NAME="sgd", LR=0.1, MOMENTUM=0.9, WEIGHT_DECAY=0.01)
    tx = build_optimizer(cfg)
    p = {"w": jnp.asarray([1.0, -2.0])}
    g = {"w": jnp.asarray([0.5, 0.5])}
    state = tx.init(p)
    # torch: buf = g + wd*p; p -= lr*buf (first step, dampening 0)
    upd, state = tx.update(g, state, p)
    new_p = optax.apply_updates(p, upd)
    grad_eff = np.array([0.5, 0.5]) + 0.01 * np.array([1.0, -2.0])
    expect = np.array([1.0, -2.0]) - 0.1 * grad_eff
    np.testing.assert_allclose(np.asarray(new_p["w"]), expect, rtol=1e-6)
    # second step: buf = momentum*buf + g_eff
    p2 = {"w": jnp.asarray(expect)}
    g2 = {"w": jnp.asarray([0.5, 0.5])}
    grad_eff2 = np.array([0.5, 0.5]) + 0.01 * expect
    buf2 = 0.9 * grad_eff + grad_eff2
    upd2, state = tx.update(g2, state, p2)
    new_p2 = optax.apply_updates(p2, upd2)
    np.testing.assert_allclose(np.asarray(new_p2["w"]), expect - 0.1 * buf2, rtol=1e-5)


def test_rmsprop_matches_torch():
    """optax rmsprop needs eps_in_sqrt=False to match torch.optim.RMSprop's
    g/(sqrt(v)+eps) denominator — the optax default rsqrt(v+eps) differs ~3x
    at small v.  Oracle: the actual torch optimizer, several steps."""
    import torch

    cfg = _optim_cfg(NAME="rmsprop", LR=0.01, MOMENTUM=0.9,
                     WEIGHT_DECAY=0.01, RMSPROP_ALPHA=0.99)
    tx = build_optimizer(cfg)
    w0 = np.array([1.0, -2.0, 0.5], np.float64)
    grads = [np.array([1e-4, 0.5, -0.3]), np.array([0.2, -0.1, 0.4]),
             np.array([-0.05, 0.3, 0.1])]

    tw = torch.nn.Parameter(torch.tensor(w0))
    topt = torch.optim.RMSprop([tw], lr=0.01, alpha=0.99, momentum=0.9,
                               weight_decay=0.01)
    for g in grads:
        topt.zero_grad()
        tw.grad = torch.tensor(g)
        topt.step()

    p = {"w": jnp.asarray(w0)}
    state = tx.init(p)
    for g in grads:
        upd, state = tx.update({"w": jnp.asarray(g)}, state, p)
        p = optax.apply_updates(p, upd)
    np.testing.assert_allclose(np.asarray(p["w"]),
                               tw.detach().numpy(), rtol=1e-6, atol=1e-9)


def test_set_learning_rate():
    tx = build_optimizer(_optim_cfg(NAME="sgd", LR=0.1, WEIGHT_DECAY=0.0))
    state = tx.init({"w": jnp.zeros(2)})
    state = set_learning_rate(state, 0.05)
    assert abs(get_learning_rate(state) - 0.05) < 1e-9
