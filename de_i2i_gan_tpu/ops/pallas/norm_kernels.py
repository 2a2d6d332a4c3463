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
# in+out slab budget, counted in the IO dtype (the f32 math streams
# through CHUNK-row temporaries). Mosaic double-buffers every block along
# the grid, so the scoped-VMEM bill is 2x this plus the channel vectors;
# 7MB keeps the total under the 16MB/core limit (measured: 8MB of slabs
# -> 16MB scoped -> OOM by 4KB on a v5e).
MAX_SLAB_BYTES = 7 * 1024 * 1024


def _apply_act(y, act: Optional[str]):
    if act is None:
        return y
    if act == "relu":
        return jnp.maximum(y, 0.0)
    if act == "leaky_relu":
        return jnp.where(y >= 0, y, 0.2 * y)
    raise ValueError(f"unsupported fused activation {act}")


# rows of f32 math live at once; the (chunk, 128) f32 temporary is 1MB.
# Slabs whose HW exceeds this are processed by an in-kernel fori_loop, so
# VMEM holds only the IO-dtype slabs plus one chunk of f32 — what lets
# bf16 128^2x128 (16k rows) fit where a full-slab f32 upcast OOMs.
CHUNK = 2048


def _fwd_kernel(x_ref, g_ref, b_ref, o_ref, mean_ref, inv_ref, *,
                eps: float, act: Optional[str]):
    j = pl.program_id(1)
    lanes = pl.ds(pl.multiple_of(j * LANE, LANE), LANE)
    hw = x_ref.shape[1]
    chunk = min(hw, CHUNK)
    nchunks = hw // chunk

    # pass 1: single-pass moments (sum + sum-of-squares) accumulated over
    # HW chunks — no full-slab f32 temporary, no `centered` intermediate.
    # f32 accumulation over <=64k O(1)-scale activations keeps the
    # cancellation error well under the 1e-3 test tolerance.
    def acc_body(i, acc):
        s, ss = acc
        xc = x_ref[0, pl.ds(i * chunk, chunk), :].astype(jnp.float32)
        return (s + jnp.sum(xc, axis=0, keepdims=True),
                ss + jnp.sum(xc * xc, axis=0, keepdims=True))

    zero = jnp.zeros((1, LANE), jnp.float32)
    s, ss = jax.lax.fori_loop(0, nchunks, acc_body, (zero, zero))
    mean = s / hw
    var = jnp.maximum(ss / hw - mean * mean, 0.0)
    inv = jax.lax.rsqrt(var + eps)
    gamma = g_ref[0, 0, lanes]
    beta = b_ref[0, 0, lanes]
    scale = inv * (1.0 + gamma)[None, :]
    shift = beta[None, :] - mean * scale

    # pass 2: normalize + modulate + activate, chunk by chunk (VMEM-to-VMEM;
    # HBM traffic stays 1 read + 1 write of x)
    def out_body(i, _):
        xc = x_ref[0, pl.ds(i * chunk, chunk), :].astype(jnp.float32)
        y = xc * scale + shift
        o_ref[0, pl.ds(i * chunk, chunk), :] = \
            _apply_act(y, act).astype(o_ref.dtype)
        return 0

    jax.lax.fori_loop(0, nchunks, out_body, 0)
    mean_ref[0, 0, lanes] = mean[0]
    inv_ref[0, 0, lanes] = inv[0]


def _bwd_kernel(x_ref, g_ref, b_ref, mean_ref, inv_ref, dy_ref,
                dx_ref, dg_ref, db_ref, *, act: Optional[str]):
    j = pl.program_id(1)
    lanes = pl.ds(pl.multiple_of(j * LANE, LANE), LANE)
    hw = x_ref.shape[1]
    chunk = min(hw, CHUNK)
    nchunks = hw // chunk
    mean = mean_ref[0, 0, lanes][None, :]
    inv = inv_ref[0, 0, lanes][None, :]
    gamma = g_ref[0, 0, lanes][None, :]
    beta = b_ref[0, 0, lanes][None, :]

    def gated(i):
        """One chunk of (act-gated dy, xhat) in f32."""
        sl = pl.ds(i * chunk, chunk)
        xc = x_ref[0, sl, :].astype(jnp.float32)
        dyc = dy_ref[0, sl, :].astype(jnp.float32)
        xhat = (xc - mean) * inv
        if act is not None:
            # recompute pre-act y to gate the activation derivative
            y = xhat * (1.0 + gamma) + beta
            if act == "relu":
                dyc = jnp.where(y > 0, dyc, 0.0)
            elif act == "leaky_relu":
                dyc = jnp.where(y >= 0, dyc, 0.2 * dyc)
        return dyc, xhat

    # pass 1: dg = sum(dy*xhat), db = sum(dy) — which are also hw * the
    # means the dx formula needs
    def acc_body(i, acc):
        s_dy, s_dyx = acc
        dyc, xhat = gated(i)
        return (s_dy + jnp.sum(dyc, axis=0, keepdims=True),
                s_dyx + jnp.sum(dyc * xhat, axis=0, keepdims=True))

    zero = jnp.zeros((1, LANE), jnp.float32)
    s_dy, s_dyx = jax.lax.fori_loop(0, nchunks, acc_body, (zero, zero))
    dg_ref[0, 0, lanes] = s_dyx[0]
    db_ref[0, 0, lanes] = s_dy[0]

    # pass 2: dx = (1+gamma)*inv*(dy - mean(dy) - xhat*mean(dy*xhat))
    a_inv = (1.0 + gamma) * inv
    m_dy = s_dy / hw
    m_dyx = s_dyx / hw

    def dx_body(i, _):
        dyc, xhat = gated(i)
        dx_ref[0, pl.ds(i * chunk, chunk), :] = \
            (a_inv * (dyc - m_dy - xhat * m_dyx)).astype(dx_ref.dtype)
        return 0

    jax.lax.fori_loop(0, nchunks, dx_body, 0)


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


def _check_shape(hw: int, c: int) -> None:
    # the chunked kernels iterate hw // chunk full chunks; a remainder
    # would be silently dropped from the moments AND the output, so
    # ineligible shapes must fail loudly (fits_vmem gates the normal
    # dispatch path, but direct / interpret-mode calls bypass it)
    chunk = min(hw, CHUNK)
    if hw % chunk != 0:
        raise ValueError(
            f"pallas modulated IN requires HW % {chunk} == 0, got HW={hw}")
    if c % LANE != 0:
        raise ValueError(
            f"pallas modulated IN requires C % {LANE} == 0, got C={c}")


def _fwd_call(x, gamma, beta, act, eps, interpret):
    n, h, w, c = x.shape
    hw = h * w
    _check_shape(hw, c)
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
    _check_shape(hw, c)
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


def _xla_bwd(x, gamma, beta, mean, inv, dy, act):
    """Backward math as plain XLA ops — used when the 3-slab backward
    kernel would not fit VMEM (the forward kernel is 2-slab and fits a
    wider range of shapes). Same formulas as _bwd_kernel."""
    n, h, w, c = x.shape
    xf = x.astype(jnp.float32).reshape(n, h * w, c)
    dyf = dy.astype(jnp.float32).reshape(n, h * w, c)
    mean_ = mean.reshape(n, 1, c)
    inv_ = inv.reshape(n, 1, c)
    g = gamma.astype(jnp.float32).reshape(n, 1, c)
    xhat = (xf - mean_) * inv_
    if act is not None:
        y = xhat * (1.0 + g) + beta.astype(jnp.float32).reshape(n, 1, c)
        if act == "relu":
            dyf = jnp.where(y > 0, dyf, 0.0)
        elif act == "leaky_relu":
            dyf = jnp.where(y >= 0, dyf, 0.2 * dyf)
    dg = jnp.sum(dyf * xhat, axis=1)
    db = jnp.sum(dyf, axis=1)
    a_inv = (1.0 + g) * inv_
    m_dy = jnp.mean(dyf, axis=1, keepdims=True)
    m_dyx = jnp.mean(dyf * xhat, axis=1, keepdims=True)
    dx = (a_inv * (dyf - m_dy - xhat * m_dyx)).astype(x.dtype)
    return dx.reshape(x.shape), dg.reshape(n, c), db.reshape(n, c)


def _vjp_bwd(act, eps, interpret, residuals, dy):
    x, gamma, beta, mean, inv = residuals
    if fits_vmem_bwd(x.shape, x.dtype) or interpret:
        dx, dg, db = _bwd_call(x, gamma, beta, mean, inv, dy, act, interpret)
    else:
        dx, dg, db = _xla_bwd(x, gamma, beta, mean, inv, dy, act)
    return dx, dg.astype(gamma.dtype), db.astype(beta.dtype)


pallas_modulated_instance_norm.defvjp(_vjp_fwd, _vjp_bwd)


def fits_vmem(x_shape, dtype=jnp.float32) -> bool:
    """Forward-kernel eligibility: x slab + output slab in the IO dtype
    (the f32 math streams through CHUNK-row temporaries) within budget."""
    n, h, w, c = x_shape
    hw = h * w
    if c % LANE != 0 or hw % min(hw, CHUNK) != 0:
        return False
    item = jnp.dtype(dtype).itemsize
    return hw * LANE * item * 2 <= MAX_SLAB_BYTES


def fits_vmem_bwd(x_shape, dtype=jnp.float32) -> bool:
    """Backward-kernel eligibility: x + dy in, dx out = 3 slabs."""
    n, h, w, c = x_shape
    hw = h * w
    if c % LANE != 0 or hw % min(hw, CHUNK) != 0:
        return False
    item = jnp.dtype(dtype).itemsize
    return hw * LANE * item * 3 <= MAX_SLAB_BYTES
