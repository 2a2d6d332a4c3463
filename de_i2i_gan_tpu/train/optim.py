"""Optimizer / LR-schedule factory.

Mirrors the reference factory semantics (trainers/base_trainer.py:68-126):
  * sgd | rmsprop | adam (betas 0.5/0.999) | adamw (betas 0.9/0.95)
  * per-network learning rates for TTUR (--lr lr_d lr_g)
  * schedulers stepped per *epoch*: StepLR with 4 decay steps, ExponentialLR,
    CosineAnnealing with eta_min = lr * lr_decay

Here schedules are pure functions of the optimizer update count. A network
updated every ``update_every`` iterations (the generator under num_critics,
defectgan_trainer.py:108) converts its count back to epochs with that factor.
"""
from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import optax

from de_i2i_gan_tpu.config import TrainConfig


def lr_schedule(tcfg: TrainConfig, base_lr: float, iters_per_epoch: int,
                num_epochs: int, update_every: int = 1):
    """Return an optax schedule fn: update-count -> lr."""

    def epoch_of(count):
        return jnp.minimum(count * update_every // max(iters_per_epoch, 1),
                           num_epochs)

    if tcfg.scheduler == "step":
        step_cnt = 4
        step_size = max(num_epochs // step_cnt, 1)
        gamma = tcfg.lr_decay ** (1.0 / step_cnt)

        def sched(count):
            return base_lr * gamma ** (epoch_of(count) // step_size)
    elif tcfg.scheduler == "exp":
        gamma = tcfg.lr_decay ** (1.0 / max(num_epochs, 1))

        def sched(count):
            return base_lr * gamma ** epoch_of(count)
    elif tcfg.scheduler == "cos":
        eta_min = base_lr * tcfg.lr_decay

        def sched(count):
            t = epoch_of(count) / max(num_epochs, 1)
            return eta_min + (base_lr - eta_min) * 0.5 * (1 + jnp.cos(jnp.pi * t))
    elif tcfg.scheduler in (None, "none", "const"):
        def sched(count):
            return base_lr
    else:
        raise NameError(f"scheduler named {tcfg.scheduler} not defined")
    return sched


def make_optimizer(tcfg: TrainConfig, base_lr: float, iters_per_epoch: int,
                   num_epochs: int, update_every: int = 1,
                   clip_grad: Optional[float] = None) -> optax.GradientTransformation:
    sched = lr_schedule(tcfg, base_lr, iters_per_epoch, num_epochs, update_every)
    name = tcfg.optimizer
    if name == "sgd":
        tx = optax.sgd(learning_rate=sched)
    elif name == "rmsprop":
        # torch RMSprop defaults: alpha 0.99, eps 1e-8
        tx = optax.rmsprop(learning_rate=sched, decay=0.99, eps=1e-8)
    elif name == "adam":
        tx = optax.adam(learning_rate=sched, b1=0.5, b2=0.999, eps=1e-8)
    elif name == "adamw":
        tx = optax.adamw(learning_rate=sched, b1=0.9, b2=0.95, eps=1e-8)
    else:
        raise NameError(f"optimizer named {name} not defined")
    if clip_grad:
        tx = optax.chain(optax.clip_by_global_norm(clip_grad), tx)
    return tx


def ema_update(ema_params, new_params, decay: float):
    """EMA lerp (stargan-v2 core/solver.py:549-551 moving_average beta=0.999)."""
    return optax.incremental_update(new_params, ema_params, 1.0 - decay)
