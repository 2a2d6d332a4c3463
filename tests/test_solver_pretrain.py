"""StarGAN v2 pretrain mode + SEAN DefectGAN-with-bank smoke tests."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from de_i2i_gan_tpu.train.solver import StarGANv2Config, StarGANv2Solver

CFG = StarGANv2Config(img_size=64, num_domains=3, style_dim=8, latent_dim=4,
                      hidden_nc=16, embed_nc=12, w_hpf=0.0, max_conv_dim=64,
                      batch_size=2, ds_iter=10, total_iters=10)


@pytest.mark.parametrize("norm_type", ["adain", "sean"])
def test_pretrain_step(norm_type):
    cfg = StarGANv2Config(**{**CFG.__dict__, "norm_type": norm_type})
    solver = StarGANv2Solver(cfg)
    state = solver.init_pretrain_state(jax.random.PRNGKey(0),
                                       mask_ratio=0.5, patch_size=8)
    assert "token" in state.G.params and "net" in state.G.params
    k = jax.random.PRNGKey(1)
    batch = {
        "x_ref": jax.random.uniform(k, (2, 64, 64, 3), minval=-1, maxval=1),
        "x_ref2": jax.random.uniform(jax.random.PRNGKey(2), (2, 64, 64, 3)),
        "y_ref": jnp.asarray([0, 2], jnp.int32),
        "z_ref": jax.random.normal(k, (2, 4)),
    }
    if norm_type == "sean":
        batch["s_ref"] = jax.random.normal(k, (2, 5, 12))
    state2, metrics = solver.jit_pretrain_step(state, batch,
                                               jax.random.PRNGKey(3))
    assert int(state2.step) == 1
    for key, v in metrics.items():
        assert np.isfinite(float(v)), key
    assert "G/ref_rec" in metrics and "D/ref_reg" in metrics


def test_defectgan_sean_with_bank_trains():
    """SEAN DefectGAN end to end with an embedding bank attached."""
    from de_i2i_gan_tpu.config import DefectGanConfig, TrainConfig
    from de_i2i_gan_tpu.data.embeddings import EmbeddingBank, attach_embeddings
    from de_i2i_gan_tpu.train.steps import DefectGanSteps

    cfg = DefectGanConfig(image_size=32, label_nc=3, ngf=8, ndf=8,
                          num_scales=2, num_res=2, hidden_nc=16, embed_nc=12,
                          num_embeds=2, num_layers=2,
                          style_norm_block_type="sean",
                          use_running_stats=True)
    tcfg = TrainConfig(batch_size=2, num_critics=1, lr=(2e-4,))
    steps = DefectGanSteps(cfg, tcfg, 10, 2)
    state = steps.init_state(jax.random.PRNGKey(0))

    bank = EmbeddingBank(label_nc=3, embed_nc=12, capacity=8)
    rng = np.random.default_rng(0)
    for key in ((1, 0, 0), (0, 1, 0), (0, 0, 1)):
        for _ in range(3):
            bank.add(key, rng.normal(size=12).astype(np.float32))

    k = jax.random.PRNGKey(1)
    batch = {
        "bg": jax.random.uniform(k, (1, 2, 32, 32, 3), minval=-1, maxval=1),
        "df": jax.random.uniform(k, (1, 2, 32, 32, 3), minval=-1, maxval=1),
        "df_labels": jnp.asarray([[[0., 1., 0.], [0., 0., 1.]]]),
    }
    batch = attach_embeddings(batch, bank, cfg.num_embeds,
                              jax.random.PRNGKey(2))
    state2, metrics = steps.jit_super_step(state, batch, jax.random.PRNGKey(3))
    for key, v in metrics.items():
        assert np.isfinite(float(v)), key
    # running stats tracked during the G step
    counts = np.asarray(jax.tree_util.tree_leaves(
        {k_: v["count"] for k_, v in _find_counts(
            state2.G.state["sean_stats"]).items()})).sum()
    assert counts > 0


def _find_counts(tree, out=None, path=""):
    out = {} if out is None else out
    if isinstance(tree, dict):
        if "count" in tree and "sumsq" in tree:
            out[path] = tree
        else:
            for k, v in tree.items():
                _find_counts(v, out, path + "/" + k)
    return out
