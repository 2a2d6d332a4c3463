"""Checkpoint round-trip + cross-variant warm start + resume record."""
import jax
import jax.numpy as jnp
import numpy as np

from de_i2i_gan_tpu.config import DefectGanConfig, MAEConfig, TrainConfig
from de_i2i_gan_tpu.train.checkpoint import (
    latest_exists, load_checkpoint, read_iter_record, save_checkpoint)
from de_i2i_gan_tpu.train.mae_steps import MAESteps
from de_i2i_gan_tpu.train.steps import DefectGanSteps

CFG = DefectGanConfig(image_size=32, label_nc=3, ngf=8, ndf=8, num_scales=2,
                      num_res=2, hidden_nc=16, embed_nc=12, num_embeds=2,
                      num_layers=2)
TC5 = TrainConfig(batch_size=2, num_critics=1, lr=(2e-4,))


def test_roundtrip_and_iter_record(tmp_path):
    steps = DefectGanSteps(CFG, TC5, iters_per_epoch=5, num_epochs=2)
    state = steps.init_state(jax.random.PRNGKey(0))
    save_checkpoint(tmp_path, "exp", "latest", state, epoch=3, iters=42)
    assert latest_exists(tmp_path, "exp")
    assert read_iter_record(tmp_path, "exp") == (3, 42)

    target = steps.init_state(jax.random.PRNGKey(7))  # different init
    restored = load_checkpoint(tmp_path, "exp", "latest", target)
    a = jax.tree_util.tree_leaves(state.G.params)
    b = jax.tree_util.tree_leaves(restored.G.params)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_cross_variant_warm_start(tmp_path):
    """MAE checkpoint (params = {net, token}) warm-starts plain DefectGAN
    training (params = net) via the filtered restore — the reference's
    strict=False load (networks/__init__.py:14-23)."""
    mae = MAESteps(CFG, MAEConfig(), TrainConfig(batch_size=2, lr=(1e-4,),
                                                 loss_weight=(10, 3, 1)),
                   iters_per_epoch=5, num_epochs=2)
    mae_state = mae.init_state(jax.random.PRNGKey(0))
    save_checkpoint(tmp_path, "mae_exp", "latest", mae_state)

    dg = DefectGanSteps(CFG, TC5, iters_per_epoch=5, num_epochs=2)
    dg_state = dg.init_state(jax.random.PRNGKey(9))

    # hand-shaped target: wrap dg params in the mae layout to pull 'net'
    class Wrap:
        pass

    # restore into the dg state via a shim dict matching the mae tree
    from flax import serialization
    raw = serialization.msgpack_restore(
        (tmp_path / "mae_exp" / "latest_state.msgpack").read_bytes())
    mae_g_net = raw["G"]["params"]["net"]

    from de_i2i_gan_tpu.train.checkpoint import _merge_filtered
    stats = {"restored": 0, "missing": [], "shape_mismatch": [], "skipped": []}
    merged = _merge_filtered(
        serialization.to_state_dict(dg_state.G.params), mae_g_net, stats=stats)
    assert stats["restored"] > 0
    # generator conv kernels should now match the MAE pretrained values
    flat_mae = jax.tree_util.tree_leaves(mae_state.G.params["net"])
    flat_new = jax.tree_util.tree_leaves(merged)
    assert len(flat_mae) == len(flat_new)
    for x, y in zip(flat_mae, flat_new):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_filtered_restore_handles_mismatch(tmp_path):
    steps = DefectGanSteps(CFG, TC5, iters_per_epoch=5, num_epochs=2)
    state = steps.init_state(jax.random.PRNGKey(0))
    save_checkpoint(tmp_path, "a", "latest", state)

    cfg2 = CFG.replace(ngf=16)  # different widths -> shape mismatches
    steps2 = DefectGanSteps(cfg2, TC5, iters_per_epoch=5, num_epochs=2)
    target = steps2.init_state(jax.random.PRNGKey(1))
    restored = load_checkpoint(tmp_path, "a", "latest", target, strict=False,
                               verbose=False)
    # shapes preserved from target everywhere
    for t, r in zip(jax.tree_util.tree_leaves(target.G.params),
                    jax.tree_util.tree_leaves(restored.G.params)):
        assert np.asarray(t).shape == np.asarray(r).shape
