"""Differentiable augmentation for data-efficient GAN training.

Re-implements the DiffAugment policies (Zhao et al., arXiv 2006.10738) used by
the reference on discriminator inputs (/root/reference/defectGAN/utils/diffaug.py:
brightness/saturation/contrast, translation, cutout) as pure JAX on NHWC
images, keyed by an explicit PRNG. Gradients flow through every policy (the
translation/cutout gathers are piecewise-constant in the random offsets but
differentiable in the pixel values, matching the reference).
"""
from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp


def _rand_brightness(key, x):
    b = jax.random.uniform(key, (x.shape[0], 1, 1, 1), x.dtype) - 0.5
    return x + b


def _rand_saturation(key, x):
    mean = x.mean(axis=3, keepdims=True)
    s = jax.random.uniform(key, (x.shape[0], 1, 1, 1), x.dtype) * 2.0
    return (x - mean) * s + mean


def _rand_contrast(key, x):
    mean = x.mean(axis=(1, 2, 3), keepdims=True)
    c = jax.random.uniform(key, (x.shape[0], 1, 1, 1), x.dtype) + 0.5
    return (x - mean) * c + mean


def _rand_translation(key, x, ratio: float = 0.125):
    n, h, w, _ = x.shape
    sh = int(h * ratio + 0.5)
    sw = int(w * ratio + 0.5)
    kx, ky = jax.random.split(key)
    tx = jax.random.randint(kx, (n, 1, 1), -sh, sh + 1)
    ty = jax.random.randint(ky, (n, 1, 1), -sw, sw + 1)
    # zero-pad by 1 and gather shifted indices (clamped), matching the
    # reference's pad+grid formulation (diffaug.py:39-52)
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    gx = jnp.clip(jnp.arange(h)[None, :, None] + tx + 1, 0, h + 1)
    gy = jnp.clip(jnp.arange(w)[None, None, :] + ty + 1, 0, w + 1)
    bidx = jnp.arange(n)[:, None, None]
    return xp[bidx, gx, gy]


def _rand_cutout(key, x, ratio: float = 0.5):
    n, h, w, _ = x.shape
    ch = int(h * ratio + 0.5)
    cw = int(w * ratio + 0.5)
    kx, ky = jax.random.split(key)
    ox = jax.random.randint(kx, (n, 1, 1), 0, h + (1 - ch % 2))
    oy = jax.random.randint(ky, (n, 1, 1), 0, w + (1 - cw % 2))
    rows = jnp.arange(h)[None, :, None]
    cols = jnp.arange(w)[None, None, :]
    in_h = (rows >= ox - ch // 2) & (rows < ox - ch // 2 + ch)
    in_w = (cols >= oy - cw // 2) & (cols < oy - cw // 2 + cw)
    mask = 1.0 - (in_h & in_w).astype(x.dtype)
    return x * mask[..., None]


_POLICIES = {
    "color": (_rand_brightness, _rand_saturation, _rand_contrast),
    "translation": (_rand_translation,),
    "cutout": (_rand_cutout,),
}


def diff_augment(key: jax.Array, x: jax.Array, policy: str = "") -> jax.Array:
    """Apply the comma-separated DiffAugment policy string to NHWC images."""
    if not policy:
        return x
    for p in policy.split(","):
        for fn in _POLICIES[p]:
            key, sub = jax.random.split(key)
            x = fn(sub, x)
    return x
