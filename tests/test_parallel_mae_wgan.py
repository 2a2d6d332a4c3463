"""Data-parallel equivalence for the remaining step families (MAE, WGAN)
on the virtual 8-device CPU mesh — completes the per-family coverage next
to DefectGAN (test_parallel.py) and pix2pix/StarGAN v2
(test_parallel_flagship.py). Tolerances: metrics tight; params at
atol ~O(lr) because Adam/RMSProp amplify reduction-order noise on
near-zero-gradient leaves."""
import jax
import jax.numpy as jnp
import numpy as np

from de_i2i_gan_tpu.parallel.mesh import make_mesh, replicate
import pytest

# long-compile module (sgv2 programs / mesh GSPMD / subprocess workers);
# deselect with -m 'not slow' (pyproject [tool.pytest.ini_options].markers)
pytestmark = pytest.mark.slow


def _run_both(steps, state, batch, key):
    ref_state, ref_metrics = jax.jit(steps.super_step)(state, batch, key)

    mesh = make_mesh()
    from jax.sharding import NamedSharding, PartitionSpec as P
    sh = NamedSharding(mesh, P(None, "data"))
    sharded = jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), batch)
    pstep = jax.jit(steps.super_step,
                    in_shardings=(replicate(mesh),
                                  jax.tree_util.tree_map(lambda _: sh,
                                                         batch),
                                  replicate(mesh)),
                    out_shardings=(replicate(mesh), replicate(mesh)))
    par_state, par_metrics = pstep(
        jax.device_put(state, replicate(mesh)), sharded, key)

    for k in ref_metrics:
        np.testing.assert_allclose(float(ref_metrics[k]),
                                   float(par_metrics[k]), rtol=2e-3,
                                   atol=1e-4, err_msg=k)
    for a, b in zip(jax.tree_util.tree_leaves(ref_state.G.params),
                    jax.tree_util.tree_leaves(par_state.G.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-3,
                                   atol=5e-4)


def test_mae_super_step_matches_single_device():
    from de_i2i_gan_tpu.config import (DefectGanConfig, MAEConfig,
                                       TrainConfig)
    from de_i2i_gan_tpu.train.mae_steps import MAESteps

    cfg = DefectGanConfig(image_size=16, label_nc=3, ngf=4, ndf=4,
                          num_scales=1, num_res=2, hidden_nc=8,
                          num_layers=1)
    mcfg = MAEConfig(mask_ratio=0.5, patch_size=8)
    tcfg = TrainConfig(batch_size=8, num_critics=1, lr=(1e-4,),
                       loss_weight=(10.0, 3.0, 1.0))
    steps = MAESteps(cfg, mcfg, tcfg, iters_per_epoch=4, num_epochs=2)
    state = steps.init_state(jax.random.PRNGKey(0))
    batch = {
        "imgs": jax.random.uniform(jax.random.PRNGKey(1), (1, 8, 16, 16, 3),
                                   minval=-1, maxval=1),
        "labels": jnp.tile(jnp.asarray([[0., 1., 0.]]), (1, 8, 1)),
    }
    _run_both(steps, state, batch, jax.random.PRNGKey(3))


def test_wgan_super_step_matches_single_device():
    from de_i2i_gan_tpu.config import TrainConfig, WGanConfig
    from de_i2i_gan_tpu.train.wgan_steps import WGanSteps

    cfg = WGanConfig(image_size=16, noise_dim=8, ngf=4, ndf=4, num_layers=1)
    tcfg = TrainConfig(batch_size=8, num_critics=2, lr=(1e-4,),
                       optimizer="rmsprop")
    steps = WGanSteps(cfg, tcfg, iters_per_epoch=4, num_epochs=2)
    state = steps.init_state(jax.random.PRNGKey(0))
    batch = {
        "imgs": jax.random.uniform(jax.random.PRNGKey(1), (2, 8, 16, 16, 3),
                                   minval=-1, maxval=1),
        "labels": jnp.zeros((2, 8, 1)),
    }
    _run_both(steps, state, batch, jax.random.PRNGKey(3))
