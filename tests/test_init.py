"""Weight re-initialization dispatch (reference BaseNetwork.init_weights,
base_network.py:27-53): --init_type [normal|xavier|kaiming|orthogonal]."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from de_i2i_gan_tpu.nn.layers import reinit_params


def _params():
    return {
        "conv": {"kernel": jnp.zeros((3, 3, 8, 16)),
                 "bias": jnp.ones((16,))},
        "norm": {"scale": jnp.zeros((16,)), "bias": jnp.ones((16,))},
        "tok": {"mask_token": jnp.full((1, 4), 7.0)},
    }


def test_normal_and_common_rules():
    out = reinit_params(jax.random.PRNGKey(0), _params(), "normal", 0.02)
    k = np.asarray(out["conv"]["kernel"])
    assert abs(k.std() - 0.02) < 0.004
    assert (np.asarray(out["conv"]["bias"]) == 0).all()
    assert abs(np.asarray(out["norm"]["scale"]).mean() - 1.0) < 0.05
    # non Conv/Linear/norm leaves stay untouched
    assert (np.asarray(out["tok"]["mask_token"]) == 7.0).all()


def test_kaiming_fan_in_std():
    out = reinit_params(jax.random.PRNGKey(1), _params(), "kaiming", 0.02)
    k = np.asarray(out["conv"]["kernel"])
    assert abs(k.std() - np.sqrt(2.0 / 72)) < 0.02


def test_xavier_std():
    out = reinit_params(jax.random.PRNGKey(2), _params(), "xavier", 0.5)
    k = np.asarray(out["conv"]["kernel"])
    assert abs(k.std() - 0.5 * np.sqrt(2.0 / (72 + 16))) < 0.02


def test_orthogonal_columns():
    out = reinit_params(jax.random.PRNGKey(3), _params(), "orthogonal", 1.0)
    m = np.asarray(out["conv"]["kernel"]).reshape(72, 16)
    gram = m.T @ m
    assert np.allclose(gram, np.eye(16), atol=1e-4)


def test_unknown_init_type_rejected():
    with pytest.raises(ValueError):
        reinit_params(jax.random.PRNGKey(0), _params(), "bogus", 0.02)


def test_deterministic_given_key():
    a = reinit_params(jax.random.PRNGKey(5), _params(), "kaiming", 0.02)
    b = reinit_params(jax.random.PRNGKey(5), _params(), "kaiming", 0.02)
    assert np.allclose(a["conv"]["kernel"], b["conv"]["kernel"])
