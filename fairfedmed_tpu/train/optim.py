"""Optimizer and LR-schedule factories.

Mirrors Dassl/dassl/optim/optimizer.py:13-142 (adam/amsgrad/sgd/rmsprop/radam/
adamw with torch-style coupled weight decay) and lr_scheduler.py:83-155
(single_step/multi_step/cosine + constant/linear warmup).

TPU-first shape: schedulers are pure functions of the epoch counter evaluated on
host; the learning rate enters the jitted update as an optax injected
hyperparameter, so changing it never triggers recompilation.  The reference
steps its scheduler once per *epoch* (trainer.py:253-258), which in the FL loop
means once per client-local-epoch — ``LRSchedule.lr(epoch_count)`` preserves
that counting.
"""

from __future__ import annotations

import math
from typing import Sequence

import optax

AVAI_OPTIMS = ["adam", "amsgrad", "sgd", "rmsprop", "radam", "adamw"]
AVAI_SCHEDS = ["single_step", "multi_step", "cosine"]


def build_optimizer(optim_cfg) -> optax.GradientTransformation:
    """optax transform matching torch.optim semantics (coupled weight decay:
    grad += wd·param before the momentum/adaptive machinery)."""
    name = optim_cfg.NAME
    lr = optim_cfg.LR
    wd = optim_cfg.WEIGHT_DECAY
    momentum = optim_cfg.MOMENTUM

    if name not in AVAI_OPTIMS:
        raise ValueError(f"optim must be one of {AVAI_OPTIMS}, but got {name}")

    def with_decay(inner):
        if wd and name != "adamw":  # adamw decouples its own decay
            return optax.chain(optax.add_decayed_weights(wd), inner)
        return inner

    if name == "sgd":
        core = optax.inject_hyperparams(
            lambda learning_rate: with_decay(
                optax.sgd(
                    learning_rate,
                    momentum=momentum if momentum > 0 else None,
                    nesterov=optim_cfg.SGD_NESTEROV,
                )
            )
        )(learning_rate=lr)
    elif name == "adam":
        core = optax.inject_hyperparams(
            lambda learning_rate: with_decay(
                optax.adam(learning_rate, b1=optim_cfg.ADAM_BETA1, b2=optim_cfg.ADAM_BETA2)
            )
        )(learning_rate=lr)
    elif name == "amsgrad":
        core = optax.inject_hyperparams(
            lambda learning_rate: with_decay(
                optax.amsgrad(learning_rate, b1=optim_cfg.ADAM_BETA1, b2=optim_cfg.ADAM_BETA2)
            )
        )(learning_rate=lr)
    elif name == "rmsprop":
        core = optax.inject_hyperparams(
            lambda learning_rate: with_decay(
                # eps_in_sqrt=False: torch.optim.RMSprop divides by
                # sqrt(v) + eps, optax's default by sqrt(v + eps) — at small
                # v the two differ by ~3x in step size (torch-oracle test)
                optax.rmsprop(learning_rate, decay=optim_cfg.RMSPROP_ALPHA,
                              momentum=momentum if momentum > 0 else None,
                              eps_in_sqrt=False)
            )
        )(learning_rate=lr)
    elif name == "radam":
        core = optax.inject_hyperparams(
            lambda learning_rate: with_decay(
                optax.radam(learning_rate, b1=optim_cfg.ADAM_BETA1, b2=optim_cfg.ADAM_BETA2)
            )
        )(learning_rate=lr)
    else:  # adamw
        core = optax.inject_hyperparams(
            lambda learning_rate: optax.adamw(
                learning_rate, b1=optim_cfg.ADAM_BETA1, b2=optim_cfg.ADAM_BETA2, weight_decay=wd
            )
        )(learning_rate=lr)
    return core


def set_learning_rate(opt_state, lr: float):
    """Update the injected learning-rate hyperparameter in an opt state."""
    import jax.numpy as jnp

    cur = opt_state.hyperparams["learning_rate"]
    opt_state.hyperparams["learning_rate"] = jnp.asarray(lr, getattr(cur, "dtype", jnp.float32))
    return opt_state


def get_learning_rate(opt_state) -> float:
    return float(opt_state.hyperparams["learning_rate"])


class LRSchedule:
    """Epoch-indexed LR schedule with optional warmup."""

    def __init__(self, base_lr: float, kind: str, stepsize, gamma: float, max_epoch: int,
                 warmup_epoch: int = -1, warmup_type: str = "linear",
                 warmup_cons_lr: float = 1e-5, warmup_min_lr: float = 1e-5,
                 warmup_recount: bool = True):
        if kind not in AVAI_SCHEDS:
            raise ValueError(f"scheduler must be one of {AVAI_SCHEDS}, but got {kind}")
        if kind == "single_step":
            if isinstance(stepsize, (list, tuple)):
                stepsize = stepsize[-1]
            if stepsize <= 0:
                stepsize = max_epoch
        if kind == "multi_step" and not isinstance(stepsize, (list, tuple)):
            raise TypeError("For multi_step lr_scheduler, stepsize must be a list")
        self.base_lr = base_lr
        self.kind = kind
        self.stepsize = stepsize
        self.gamma = gamma
        self.max_epoch = max_epoch
        self.warmup_epoch = warmup_epoch
        self.warmup_type = warmup_type
        self.warmup_cons_lr = warmup_cons_lr
        self.warmup_min_lr = warmup_min_lr
        self.warmup_recount = warmup_recount

    def _base(self, epoch: int) -> float:
        if self.kind == "single_step":
            return self.base_lr * self.gamma ** (epoch // self.stepsize)
        if self.kind == "multi_step":
            k = sum(1 for m in self.stepsize if m <= epoch)
            return self.base_lr * self.gamma ** k
        # cosine
        return self.base_lr * (1 + math.cos(math.pi * epoch / self.max_epoch)) / 2

    def lr(self, epoch: int) -> float:
        if self.warmup_epoch > 0 and epoch < self.warmup_epoch:
            if self.warmup_type == "constant":
                return self.warmup_cons_lr
            if self.warmup_type == "linear":
                if epoch == 0:
                    return self.warmup_min_lr
                return self.base_lr * epoch / self.warmup_epoch
            raise ValueError(self.warmup_type)
        if self.warmup_epoch > 0 and self.warmup_recount:
            return self._base(epoch - self.warmup_epoch)
        return self._base(epoch)


def build_lr_scheduler(optim_cfg) -> LRSchedule:
    return LRSchedule(
        base_lr=optim_cfg.LR,
        kind=optim_cfg.LR_SCHEDULER,
        stepsize=optim_cfg.STEPSIZE,
        gamma=optim_cfg.GAMMA,
        max_epoch=optim_cfg.MAX_EPOCH,
        warmup_epoch=optim_cfg.WARMUP_EPOCH,
        warmup_type=optim_cfg.WARMUP_TYPE,
        warmup_cons_lr=optim_cfg.WARMUP_CONS_LR,
        warmup_min_lr=optim_cfg.WARMUP_MIN_LR,
        warmup_recount=optim_cfg.WARMUP_RECOUNT,
    )
