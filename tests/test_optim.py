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


def test_set_learning_rate():
    tx = build_optimizer(_optim_cfg(NAME="sgd", LR=0.1, WEIGHT_DECAY=0.0))
    state = tx.init({"w": jnp.zeros(2)})
    state = set_learning_rate(state, 0.05)
    assert abs(get_learning_rate(state) - 0.05) < 1e-9
