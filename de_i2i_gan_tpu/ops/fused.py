"""Fused-op dispatch: Pallas kernels on TPU, XLA composition elsewhere.

Every fused op here has an exact XLA reference implementation used (a) as the
fallback on unsupported shapes/platforms and (b) as the oracle in kernel
tests (interpret mode on CPU).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from de_i2i_gan_tpu.ops.pallas.norm_kernels import (
    fits_vmem, pallas_modulated_instance_norm)


def _xla_modulated_instance_norm(x, gamma, beta, act, eps):
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=(1, 2), keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=(1, 2), keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    y = y * (1.0 + gamma.astype(jnp.float32))[:, None, None, :] + \
        beta.astype(jnp.float32)[:, None, None, :]
    if act == "relu":
        y = jnp.maximum(y, 0.0)
    elif act == "leaky_relu":
        y = jnp.where(y >= 0, y, 0.2 * y)
    elif act is not None:
        raise ValueError(act)
    return y.astype(x.dtype)


def modulated_instance_norm(x: jax.Array, gamma: jax.Array, beta: jax.Array,
                            act: Optional[str] = None, eps: float = 1e-5,
                            use_pallas: bool = True) -> jax.Array:
    """instance_norm(x) * (1 + gamma) + beta (+ act); x NHWC, gamma/beta (N, C).

    The fused form of the SEAN/AdaIN denormalization
    (normalization.py:196-200, 62-71) and the activation that follows it in
    NormConvBlock/NormResBlock (architecture.py:244, 347-348).
    """
    on_tpu = jax.default_backend() == "tpu"
    if use_pallas and on_tpu and fits_vmem(x.shape, x.dtype):
        return pallas_modulated_instance_norm(x, gamma, beta, act, eps)
    return _xla_modulated_instance_norm(x, gamma, beta, act, eps)


# loaders may ship images as u8 [0,255] (1/4 the host->device bytes of f32,
# runtime/dataloader.cc dl_next_u8); the first thing a jitted step does is
# normalize them on device. Float images pass through untouched, so the
# same step functions serve both loader kinds.
IMAGE_KEYS = ("bg", "df", "imgs", "input", "target", "x_src", "x_ref")


def images_to_float(x: jax.Array) -> jax.Array:
    """u8 [0,255] -> f32 [-1,1] (inverse of dl_next_u8's quantization);
    floats pass through."""
    if x.dtype == jnp.uint8:
        return x.astype(jnp.float32) / 127.5 - 1.0
    return x


def batch_images_to_float(batch):
    """Apply images_to_float to the image entries of a step batch dict.

    A 6-channel ``pair`` entry (native paired loader: input+target stacked
    channel-wise so the host ships ONE contiguous u8 buffer per launch) is
    split into ``input``/``target`` here, on device, where the channel
    slice fuses into the consumers for free.
    """
    out = {k: (images_to_float(v) if k in IMAGE_KEYS else v)
           for k, v in batch.items() if k != "pair"}
    if "pair" in batch:
        pair = images_to_float(batch["pair"])
        out["input"] = pair[..., :3]
        out["target"] = pair[..., 3:]
    return out
