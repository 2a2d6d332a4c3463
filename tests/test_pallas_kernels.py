"""Pallas kernel correctness vs the XLA reference (interpret mode on CPU),
forward and backward."""
import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from de_i2i_gan_tpu.ops.fused import _xla_modulated_instance_norm
from de_i2i_gan_tpu.ops.pallas.norm_kernels import (
    fits_vmem, pallas_modulated_instance_norm)

KEY = jax.random.PRNGKey(0)
SHAPE = (2, 8, 8, 128)


def _inputs():
    kx, kg, kb = jax.random.split(KEY, 3)
    x = jax.random.normal(kx, SHAPE) * 2.0 + 1.0
    g = jax.random.normal(kg, (2, 128)) * 0.5
    b = jax.random.normal(kb, (2, 128)) * 0.5
    return x, g, b


@pytest.mark.parametrize("act", [None, "relu", "leaky_relu"])
def test_forward_matches_xla(act):
    x, g, b = _inputs()
    ref = _xla_modulated_instance_norm(x, g, b, act, 1e-5)
    out = pallas_modulated_instance_norm(x, g, b, act, 1e-5, True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5,
                               rtol=2e-5)


@pytest.mark.parametrize("act", [None, "relu", "leaky_relu"])
def test_backward_matches_xla(act):
    x, g, b = _inputs()

    def loss_ref(x, g, b):
        y = _xla_modulated_instance_norm(x, g, b, act, 1e-5)
        return jnp.sum(jnp.sin(y))  # nontrivial cotangent

    def loss_pl(x, g, b):
        y = pallas_modulated_instance_norm(x, g, b, act, 1e-5, True)
        return jnp.sum(jnp.sin(y))

    gref = jax.grad(loss_ref, argnums=(0, 1, 2))(x, g, b)
    gpl = jax.grad(loss_pl, argnums=(0, 1, 2))(x, g, b)
    for a, c, name in zip(gref, gpl, "xgb"):
        np.testing.assert_allclose(np.asarray(c), np.asarray(a), atol=3e-4,
                                   rtol=3e-4, err_msg=name)


def test_fits_vmem_gate():
    assert fits_vmem((2, 32, 32, 128))
    assert not fits_vmem((2, 32, 32, 100))  # lane misalignment
    assert not fits_vmem((1, 512, 512, 128))  # slab too large
    # dtype-aware: bf16 halves slab bytes -> 128x96 qualifies, f32 does not
    assert fits_vmem((8, 128, 96, 128), jnp.bfloat16)
    assert not fits_vmem((8, 128, 96, 128), jnp.float32)
    # 128^2 overflows scoped VMEM even at bf16 (double-buffered slabs)
    assert not fits_vmem((8, 128, 128, 128), jnp.bfloat16)
    # backward needs 3 slabs -> tighter
    from de_i2i_gan_tpu.ops.pallas.norm_kernels import fits_vmem_bwd
    assert fits_vmem_bwd((8, 64, 64, 128), jnp.bfloat16)
    assert not fits_vmem_bwd((8, 128, 128, 128), jnp.bfloat16)


def test_xla_bwd_fallback_matches_kernel_bwd():
    """Shapes whose backward slabs don't fit VMEM take the _xla_bwd path;
    it must produce the same gradients as the backward kernel."""
    from de_i2i_gan_tpu.ops.pallas.norm_kernels import (
        _bwd_call, _xla_bwd, _fwd_call)
    x, g, b = _inputs()
    out, mean, inv = _fwd_call(x, g, b, "leaky_relu", 1e-5, True)
    dy = jnp.cos(out)
    k = _bwd_call(x, g, b, mean, inv, dy, "leaky_relu", True)
    r = _xla_bwd(x, g, b, mean, inv, dy, "leaky_relu")
    for a, c, name in zip(k, r, ("dx", "dg", "db")):
        np.testing.assert_allclose(np.asarray(c), np.asarray(a), atol=3e-4,
                                   rtol=3e-4, err_msg=name)


def test_forward_bf16_io():
    x, g, b = _inputs()
    xb = x.astype(jnp.bfloat16)
    ref = _xla_modulated_instance_norm(xb, g, b, "leaky_relu", 1e-5)
    out = pallas_modulated_instance_norm(xb, g, b, "leaky_relu", 1e-5, True)
    assert out.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32), atol=3e-2)
