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
