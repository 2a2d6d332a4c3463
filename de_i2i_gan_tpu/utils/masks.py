"""MAE patch-mask generation, pure-functional on jax.random.

Reference: /root/reference/defectGAN/utils/util.py:48-71
  * generate_mask: bernoulli patch grid upscaled nearest to pixel resolution
  * generate_shifted_mask: the same grid sampled one patch larger and cropped
    at a random (h, w) offset so mask boundaries do not align with a fixed
    patch lattice

TPU-first: masks are NHWC (N, H, W, 1); the random shift uses a static-size
extended grid + dynamic_slice (no data-dependent shapes under jit).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def generate_mask(key: jax.Array, batch: int, height: int, width: int,
                  patch_size: int, mask_ratio: float) -> jax.Array:
    """(N, H, W, 1) float mask; 1 = visible, 0 = masked."""
    hs, ws = height // patch_size, width // patch_size
    grid = jax.random.bernoulli(key, 1.0 - mask_ratio, (batch, hs, ws, 1))
    grid = grid.astype(jnp.float32)
    grid = jnp.repeat(grid, patch_size, axis=1)
    grid = jnp.repeat(grid, patch_size, axis=2)
    return grid


def generate_shifted_mask(key: jax.Array, batch: int, height: int, width: int,
                          patch_size: int, mask_ratio: float) -> jax.Array:
    """Randomly-shifted patch mask (util.py:60-71)."""
    k_grid, k_h, k_w = jax.random.split(key, 3)
    ext = generate_mask(k_grid, batch, height + patch_size, width + patch_size,
                        patch_size, mask_ratio)
    h_shift = jax.random.randint(k_h, (), 0, patch_size)
    w_shift = jax.random.randint(k_w, (), 0, patch_size)
    return jax.lax.dynamic_slice(
        ext, (0, h_shift, w_shift, 0), (batch, height, width, 1))
