"""FAN / wing tests: shapes, heatmap post-processing, landmark decode."""
import jax
import jax.numpy as jnp
import numpy as np

from de_i2i_gan_tpu.models.wing import (
    FAN, WingHeatmapper, preprocess_heatmaps)


def test_fan_forward_shapes():
    net = FAN()
    x = jax.random.uniform(jax.random.PRNGKey(0), (1, 256, 256, 3))
    variables = net.init(jax.random.PRNGKey(1), x)
    out, boundary = net.apply(variables, x)
    assert out.shape == (1, 64, 64, 99)  # 98 landmarks + boundary
    assert boundary.shape[-1] == 2


def test_preprocess_heatmaps():
    hm = jax.random.uniform(jax.random.PRNGKey(0), (2, 64, 64, 98))
    m1, m2 = preprocess_heatmaps(hm)
    assert m1.shape == (2, 64, 64, 1)
    assert m2.shape == (2, 64, 64, 1)
    assert float(m1.min()) >= 0 and float(m1.max()) <= 1
    # mask 2 zeroes chin/eyebrow/lip channels -> never exceeds mask 1 where
    # both come from the same sums of nonneg maps
    assert float(m2.sum()) <= float(m1.sum()) + 1e-3


def test_heatmapper_and_landmarks():
    net = FAN()
    x = jax.random.uniform(jax.random.PRNGKey(0), (1, 64, 64, 3),
                           minval=-1, maxval=1)
    variables = net.init(jax.random.PRNGKey(1),
                         jnp.zeros((1, 256, 256, 3)))
    hm = WingHeatmapper(variables)
    masks = hm.get_heatmap(x)
    assert masks[0].shape == (1, 256, 256, 1)
    lms = hm.get_landmarks(x)
    assert lms.shape == (1, 98, 2)
    assert (lms >= 0).all() and (lms <= 64).all()
