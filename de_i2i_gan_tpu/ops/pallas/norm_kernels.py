"""Pallas TPU kernel: fused instance-norm + style modulation (+ activation).

The hot elementwise chain of every conditional-norm block
(normalization.py SPADE/SEAN/AdaIN: ``instance_norm(x) * (1 + gamma) + beta``
followed by the block activation) is HBM-bandwidth-bound. XLA compiles it as
a reduce pass plus a fused normalize pass — reading x from HBM twice. This
kernel keeps the whole (HW, C-tile) slab resident in VMEM: one HBM read, one
write, with the mean/variance, modulation and activation all on-chip.

Layout: x is viewed as (N, H*W, C); the grid is (N, C/128); each program
owns a full (HW, 128) slab (lane dim 128 = VPU width). Only shapes whose
slab fits comfortably in VMEM take this path — callers fall back to the XLA
composition otherwise (ops/fused.py).
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128
# keep the slab + temporaries under ~6MB of the ~16MB VMEM
MAX_SLAB_BYTES = 6 * 1024 * 1024


def _apply_act(y, act: Optional[str]):
    if act is None:
        return y
    if act == "relu":
        return jnp.maximum(y, 0.0)
    if act == "leaky_relu":
        return jnp.where(y >= 0, y, 0.2 * y)
    raise ValueError(f"unsupported fused activation {act}")


def _fwd_kernel(x_ref, g_ref, b_ref, o_ref, mean_ref, inv_ref, *,
                eps: float, act: Optional[str]):
    j = pl.program_id(1)
    lanes = pl.ds(pl.multiple_of(j * LANE, LANE), LANE)
    x = x_ref[0].astype(jnp.float32)  # (HW, 128)
    mean = jnp.mean(x, axis=0, keepdims=True)
    centered = x - mean
    var = jnp.mean(centered * centered, axis=0, keepdims=True)
    inv = jax.lax.rsqrt(var + eps)
    gamma = g_ref[0, 0, lanes]
    beta = b_ref[0, 0, lanes]
    y = centered * inv * (1.0 + gamma)[None, :] + beta[None, :]
    o_ref[0] = _apply_act(y, act).astype(o_ref.dtype)
    mean_ref[0, 0, lanes] = mean[0]
    inv_ref[0, 0, lanes] = inv[0]


def _bwd_kernel(x_ref, g_ref, b_ref, mean_ref, inv_ref, dy_ref,
                dx_ref, dg_ref, db_ref, *, act: Optional[str]):
    j = pl.program_id(1)
    lanes = pl.ds(pl.multiple_of(j * LANE, LANE), LANE)
    x = x_ref[0].astype(jnp.float32)
    mean = mean_ref[0, 0, lanes][None, :]
    inv = inv_ref[0, 0, lanes][None, :]
    gamma = g_ref[0, 0, lanes][None, :]
    beta = b_ref[0, 0, lanes][None, :]
    dy = dy_ref[0].astype(jnp.float32)

    xhat = (x - mean) * inv
    if act is not None:
        # recompute pre-act y to gate the activation derivative
        y = xhat * (1.0 + gamma) + beta
        if act == "relu":
            dy = jnp.where(y > 0, dy, 0.0)
        elif act == "leaky_relu":
            dy = jnp.where(y >= 0, dy, 0.2 * dy)

    dg_ref[0, 0, lanes] = jnp.sum(dy * xhat, axis=0)
    db_ref[0, 0, lanes] = jnp.sum(dy, axis=0)
    # dx for instance norm: a*inv*(dy - mean(dy) - xhat*mean(dy*xhat))
    a_inv = (1.0 + gamma) * inv
    m_dy = jnp.mean(dy, axis=0, keepdims=True)
    m_dyx = jnp.mean(dy * xhat, axis=0, keepdims=True)
    dx_ref[0] = (a_inv * (dy - m_dy - xhat * m_dyx)).astype(dx_ref.dtype)


def _specs(hw, c):
    """Mosaic tiling: channel vectors are (N, 1, C) float32 with one full
    per-sample row per block (block dims must divide (8, 128) or equal the
    array dims); kernels slice their 128-lane tile at j*128 — statically a
    lane multiple."""
    slab = pl.BlockSpec((1, hw, LANE), lambda i, j: (i, 0, j),
                        memory_space=pltpu.VMEM)
    vec = pl.BlockSpec((1, 1, c), lambda i, j: (i, 0, 0),
                       memory_space=pltpu.VMEM)
    return slab, vec


def _fwd_call(x, gamma, beta, act, eps, interpret):
    n, h, w, c = x.shape
    hw = h * w
    xr = x.reshape(n, hw, c)
    g3 = gamma.reshape(n, 1, c).astype(jnp.float32)
    b3 = beta.reshape(n, 1, c).astype(jnp.float32)
    slab, vec = _specs(hw, c)
    out, mean, inv = pl.pallas_call(
        functools.partial(_fwd_kernel, eps=eps, act=act),
        grid=(n, c // LANE),
        in_specs=[slab, vec, vec],
        out_specs=(slab, vec, vec),
        out_shape=(jax.ShapeDtypeStruct(xr.shape, x.dtype),
                   jax.ShapeDtypeStruct((n, 1, c), jnp.float32),
                   jax.ShapeDtypeStruct((n, 1, c), jnp.float32)),
        interpret=interpret,
    )(xr, g3, b3)
    return out.reshape(n, h, w, c), mean, inv


def _bwd_call(x, gamma, beta, mean, inv, dy, act, interpret):
    n, h, w, c = x.shape
    hw = h * w
    xr = x.reshape(n, hw, c)
    dyr = dy.reshape(n, hw, c)
    g3 = gamma.reshape(n, 1, c).astype(jnp.float32)
    b3 = beta.reshape(n, 1, c).astype(jnp.float32)
    slab, vec = _specs(hw, c)
    dx, dg, db = pl.pallas_call(
        functools.partial(_bwd_kernel, act=act),
        grid=(n, c // LANE),
        in_specs=[slab, vec, vec, vec, vec, slab],
        out_specs=(slab, vec, vec),
        out_shape=(jax.ShapeDtypeStruct(xr.shape, x.dtype),
                   jax.ShapeDtypeStruct((n, 1, c), jnp.float32),
                   jax.ShapeDtypeStruct((n, 1, c), jnp.float32)),
        interpret=interpret,
    )(xr, g3, b3, mean, inv, dyr)
    return dx.reshape(n, h, w, c), dg.reshape(n, c), db.reshape(n, c)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def pallas_modulated_instance_norm(x: jax.Array, gamma: jax.Array,
                                   beta: jax.Array, act: Optional[str] = None,
                                   eps: float = 1e-5,
                                   interpret: bool = False) -> jax.Array:
    """x: (N, H, W, C); gamma/beta: (N, C). Requires C % 128 == 0 and the
    (HW, 128) f32 slab to fit VMEM — check with `fits_vmem` before calling.
    Differentiable via a hand-written backward kernel."""
    out, _, _ = _fwd_call(x, gamma, beta, act, eps, interpret)
    return out


def _vjp_fwd(x, gamma, beta, act, eps, interpret):
    out, mean, inv = _fwd_call(x, gamma, beta, act, eps, interpret)
    return out, (x, gamma, beta, mean, inv)


def _vjp_bwd(act, eps, interpret, residuals, dy):
    x, gamma, beta, mean, inv = residuals
    dx, dg, db = _bwd_call(x, gamma, beta, mean, inv, dy, act, interpret)
    return dx, dg.astype(gamma.dtype), db.astype(beta.dtype)


pallas_modulated_instance_norm.defvjp(_vjp_fwd, _vjp_bwd)


def fits_vmem(x_shape, dtype=jnp.float32) -> bool:
    n, h, w, c = x_shape
    if c % LANE != 0:
        return False
    # slab in f32 (kernel upcasts) + output copy
    return h * w * LANE * 4 * 2 <= MAX_SLAB_BYTES
