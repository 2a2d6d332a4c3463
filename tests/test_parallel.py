"""Multi-device sharding tests on the virtual 8-device CPU mesh — the fake
backend the reference lacks (SURVEY.md §4, §2.3)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from de_i2i_gan_tpu.parallel.mesh import (
    make_mesh, make_parallel_step, replicate, shard_batch)

# long-compile module (sgv2 programs / mesh GSPMD / subprocess workers);
# deselect with -m 'not slow' (pyproject [tool.pytest.ini_options].markers)
pytestmark = pytest.mark.slow


def test_mesh_has_8_devices():
    assert len(jax.devices()) == 8
    mesh = make_mesh()
    assert mesh.devices.size == 8
    assert mesh.axis_names == ("data",)


def test_shard_batch_layout():
    mesh = make_mesh()
    batch = {"imgs": np.zeros((16, 8, 8, 3), np.float32)}
    sharded = shard_batch(batch, mesh)
    shards = sharded["imgs"].addressable_shards
    assert len(shards) == 8
    assert shards[0].data.shape == (2, 8, 8, 3)


def test_data_parallel_super_step_matches_single_device():
    """Replicated-params + sharded-batch training must produce finite metrics
    and identical results to the unsharded run (GSPMD correctness)."""
    from de_i2i_gan_tpu.config import DefectGanConfig, TrainConfig
    from de_i2i_gan_tpu.train.steps import DefectGanSteps

    cfg = DefectGanConfig(image_size=16, label_nc=3, ngf=4, ndf=4,
                          num_scales=1, num_res=2, hidden_nc=8, num_layers=1)
    tcfg = TrainConfig(batch_size=8, num_critics=1, lr=(1e-4,))
    steps = DefectGanSteps(cfg, tcfg, iters_per_epoch=4, num_epochs=2)
    state = steps.init_state(jax.random.PRNGKey(0))
    k = jax.random.PRNGKey(1)
    batch = {
        "bg": jax.random.uniform(k, (1, 8, 16, 16, 3)),
        "df": jax.random.uniform(jax.random.PRNGKey(2), (1, 8, 16, 16, 3)),
        "df_labels": jnp.tile(jnp.asarray([[0., 1., 0.]]), (1, 8, 1)),
    }

    # single-device reference result
    ref_state, ref_metrics = jax.jit(steps.super_step)(
        state, batch, jax.random.PRNGKey(3))

    mesh = make_mesh()
    from jax.sharding import NamedSharding, PartitionSpec as P
    sh = NamedSharding(mesh, P(None, "data"))
    sharded_batch = jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sh), batch)
    pstep = jax.jit(steps.super_step,
                    in_shardings=(replicate(mesh),
                                  jax.tree_util.tree_map(lambda _: sh, batch),
                                  replicate(mesh)),
                    out_shardings=(replicate(mesh), replicate(mesh)))
    par_state, par_metrics = pstep(
        jax.device_put(state, replicate(mesh)), sharded_batch,
        jax.random.PRNGKey(3))

    for k_ in ref_metrics:
        np.testing.assert_allclose(float(ref_metrics[k_]),
                                   float(par_metrics[k_]), rtol=2e-3,
                                   atol=1e-4, err_msg=k_)
    # parameters after the step agree
    for a, b in zip(jax.tree_util.tree_leaves(ref_state.G.params),
                    jax.tree_util.tree_leaves(par_state.G.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-3,
                                   atol=2e-5)


def test_graft_dryrun_multichip():
    import sys
    sys.path.insert(0, "/root/repo")
    from __graft_entry__ import dryrun_multichip
    dryrun_multichip(8)
