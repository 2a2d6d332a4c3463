"""Primitive loss functions.

Mirrors the reference's loss-type dispatch
(/root/reference/defectGAN/models/base_model.py:68-80: bce/cce/l1/l2 on raw
logits) plus StarGAN v2's R1 zero-centered gradient penalty
(stargan-v2/core/solver.py:573-583) expressed with jax.grad.

All reductions are means in float32.
"""
from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp


def bce_logits(logits: jax.Array, targets: jax.Array) -> jax.Array:
    """Sigmoid binary cross-entropy on logits, mean-reduced
    (torch F.binary_cross_entropy_with_logits)."""
    logits = logits.astype(jnp.float32)
    targets = targets.astype(jnp.float32)
    # numerically-stable form: max(x,0) - x*t + log(1+exp(-|x|))
    loss = jnp.maximum(logits, 0) - logits * targets + \
        jnp.log1p(jnp.exp(-jnp.abs(logits)))
    return loss.mean()


def cce_logits(logits: jax.Array, targets: jax.Array) -> jax.Array:
    """Softmax cross-entropy on logits; targets are class probabilities
    (torch F.cross_entropy with prob targets) or integer class ids."""
    logits = logits.astype(jnp.float32)
    logp = jax.nn.log_softmax(logits, axis=-1)
    if targets.ndim == logits.ndim - 1:
        targets = jax.nn.one_hot(targets, logits.shape[-1], dtype=jnp.float32)
    return -(targets.astype(jnp.float32) * logp).sum(axis=-1).mean()


def l1(a: jax.Array, b: jax.Array) -> jax.Array:
    return jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32)).mean()


def l2(a: jax.Array, b: jax.Array) -> jax.Array:
    return jnp.square(a.astype(jnp.float32) - b.astype(jnp.float32)).mean()


_LOSSES = {"bce": bce_logits, "bce_logits": bce_logits,
           "cce": cce_logits, "cce_logits": cce_logits,
           "l1": l1, "l2": l2, "mse": l2}


def cal_loss(logits: jax.Array, targets: jax.Array, loss_type: str) -> jax.Array:
    try:
        return _LOSSES[loss_type](logits, targets)
    except KeyError:
        raise ValueError(f"loss_type: {loss_type} is invalid") from None


def r1_penalty(d_real_sum_fn: Callable[[jax.Array], jax.Array],
               x_real: jax.Array) -> jax.Array:
    """Zero-centered gradient penalty on real images (solver.py:573-583):
    0.5 * E[ ||d D(x) / d x||^2 ].

    d_real_sum_fn maps images -> scalar sum of real logits; in JAX the double
    backprop is just grad-of-grad, no create_graph bookkeeping.
    """
    grad = jax.grad(d_real_sum_fn)(x_real)
    batch = x_real.shape[0]
    return 0.5 * jnp.sum(jnp.square(grad.astype(jnp.float32))) / batch
