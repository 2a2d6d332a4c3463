"""Label helpers.

normal_labels: the 'background/normal' one-hot row used throughout the
reference loss graph (defectgan_model.py:414-415 — zeros with class 0 set).
multilabel_combinations: all 2**L binary label rows (utils/util.py:183-186).
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


def normal_labels(like: jax.Array) -> jax.Array:
    nm = jnp.zeros_like(like)
    return nm.at[:, 0].set(1.0)


def multilabel_combinations(label_nc: int) -> np.ndarray:
    """(2**L, L) array; row i is the binary expansion of i (LSB first to match
    sean_label_index)."""
    idx = np.arange(2 ** label_nc)
    return ((idx[:, None] >> np.arange(label_nc)[None, :]) & 1).astype(np.float32)
