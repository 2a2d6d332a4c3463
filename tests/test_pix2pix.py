"""Paired-i2i (pix2pixHD-style) extension tests: multi-scale D, feature
matching, LSGAN/hinge, and loss descent on a fixed paired batch."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from de_i2i_gan_tpu.config import DefectGanConfig, TrainConfig
from de_i2i_gan_tpu.train.pix2pix_steps import (
    MultiScaleDiscriminator, Pix2PixSteps, gan_loss)

CFG = DefectGanConfig(image_size=32, label_nc=2, ngf=8, ndf=8, num_scales=2,
                      num_res=2, hidden_nc=16, num_layers=2)
TC = TrainConfig(batch_size=2, lr=(2e-4,), ema_decay=0.999)


def test_multiscale_discriminator_shapes():
    d = MultiScaleDiscriminator(num_scales=2, ndf=8, num_layers=2)
    x = jax.random.uniform(jax.random.PRNGKey(0), (2, 32, 32, 6))
    v = d.init(jax.random.PRNGKey(1), x)
    outs = d.apply(v, x)
    assert len(outs) == 2
    logits0, feats0 = outs[0]
    logits1, feats1 = outs[1]
    assert logits0.shape[-1] == 1 and len(feats0) == 3
    assert logits1.shape[1] < logits0.shape[1]  # smaller scale


@pytest.mark.parametrize("kind", ["lsgan", "hinge"])
def test_gan_loss_kinds(kind):
    logits = jnp.asarray([[2.0], [-2.0]])
    d_real = gan_loss(logits, True, kind, True)
    d_fake = gan_loss(logits, False, kind, True)
    g = gan_loss(logits, True, kind, False)
    for v in (d_real, d_fake, g):
        assert np.isfinite(float(v))


def test_paired_training_descends():
    steps = Pix2PixSteps(CFG, TC, num_d_scales=2, iters_per_epoch=10,
                         num_epochs=2)
    state = steps.init_state(jax.random.PRNGKey(0))
    k = jax.random.PRNGKey(1)
    batch = {"input": jax.random.uniform(k, (2, 32, 32, 3), minval=-1,
                                         maxval=1),
             "target": jax.random.uniform(jax.random.PRNGKey(2),
                                          (2, 32, 32, 3), minval=-1,
                                          maxval=1)}
    l1s = []
    for i in range(20):
        state, m = steps.jit_train_step(state, batch, jax.random.PRNGKey(3))
        l1s.append(float(m["l1"]))
        assert np.isfinite(float(m["fm"])) and np.isfinite(float(m["d_loss"]))
    assert np.mean(l1s[-5:]) < np.mean(l1s[:5]), l1s
    assert state.ema_G is not None


def test_fused_prop_training_descends():
    """FusedProp (one joint backward for both updates, arxiv 2004.03335):
    must train like the alternating step — L1 descends, both parameter
    sets move, metrics finite."""
    steps = Pix2PixSteps(CFG, TC, num_d_scales=2, iters_per_epoch=10,
                         num_epochs=2, fused_prop=True)
    state = steps.init_state(jax.random.PRNGKey(0))
    k = jax.random.PRNGKey(1)
    batch = {"input": jax.random.uniform(k, (2, 32, 32, 3), minval=-1,
                                         maxval=1),
             "target": jax.random.uniform(jax.random.PRNGKey(2),
                                          (2, 32, 32, 3), minval=-1,
                                          maxval=1)}
    g0 = jax.tree_util.tree_leaves(state.G.params)[0].copy()
    d0 = jax.tree_util.tree_leaves(state.D.params)[0].copy()
    l1s = []
    for i in range(20):
        state, m = steps.jit_train_step(state, batch, jax.random.PRNGKey(3))
        l1s.append(float(m["l1"]))
        for v in m.values():
            assert np.isfinite(float(v))
    assert np.mean(l1s[-5:]) < np.mean(l1s[:5]), l1s
    assert not np.allclose(g0, jax.tree_util.tree_leaves(state.G.params)[0])
    assert not np.allclose(d0, jax.tree_util.tree_leaves(state.D.params)[0])
    assert int(state.step) == 20
