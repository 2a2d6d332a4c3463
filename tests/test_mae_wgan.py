"""MAE pretraining + WGAN step tests."""
import jax
import jax.numpy as jnp
import numpy as np

from de_i2i_gan_tpu.config import DefectGanConfig, MAEConfig, TrainConfig, WGanConfig
from de_i2i_gan_tpu.train.mae_steps import MAESteps
from de_i2i_gan_tpu.train.wgan_steps import WGanSteps, clip_tree
from de_i2i_gan_tpu.utils.masks import generate_mask, generate_shifted_mask

CFG = DefectGanConfig(image_size=32, label_nc=3, ngf=8, ndf=8, num_scales=2,
                      num_res=2, hidden_nc=16, embed_nc=12, num_embeds=2,
                      num_layers=2)
MC = MAEConfig(mask_ratio=0.75, patch_size=8, mask_token_type="position")
TC = TrainConfig(batch_size=2, num_critics=1, lr=(1.5e-4,),
                 loss_weight=(10, 3, 1), optimizer="adamw", scheduler="cos")


def _batch(key, b=2):
    k1, k2 = jax.random.split(key)
    return {"imgs": jax.random.uniform(k1, (b, 32, 32, 3), minval=-1, maxval=1),
            "labels": jax.nn.one_hot(jax.random.randint(k2, (b,), 0, 3), 3)}


def test_mask_generation():
    k = jax.random.PRNGKey(0)
    m = generate_mask(k, 2, 32, 32, 8, 0.75)
    assert m.shape == (2, 32, 32, 1)
    # patch structure: every 8x8 patch is constant
    patches = np.asarray(m).reshape(2, 4, 8, 4, 8)
    assert (patches.std(axis=(2, 4)) == 0).all()
    ratio = float(m.mean())
    assert 0.05 < ratio < 0.6  # ~25% visible
    ms = generate_shifted_mask(k, 2, 32, 32, 8, 0.75)
    assert ms.shape == (2, 32, 32, 1)


def test_mae_steps_train_and_eval():
    steps = MAESteps(CFG, MC, TC, iters_per_epoch=10, num_epochs=2)
    state = steps.init_state(jax.random.PRNGKey(0))
    assert "token" in state.G.params and "net" in state.G.params
    batch = _batch(jax.random.PRNGKey(1))
    state, dm = steps.jit_d_step(state, batch, jax.random.PRNGKey(2))
    state, gm = steps.jit_g_step(state, batch, jax.random.PRNGKey(3))
    for k in ("rec", "gan_G", "clf_G"):
        assert np.isfinite(float(gm[k]))
    ev = steps.jit_eval_losses(state, batch, jax.random.PRNGKey(4))
    assert np.isfinite(float(ev["rec"]))
    grid = steps.repair_grid(state, batch["imgs"], batch["labels"],
                             jax.random.PRNGKey(5))
    assert grid.shape == (2, 5, 32, 32, 3)


def test_mae_rec_decreases():
    steps = MAESteps(CFG, MC, TC, iters_per_epoch=100, num_epochs=10)
    state = steps.init_state(jax.random.PRNGKey(0))
    batch = _batch(jax.random.PRNGKey(1))
    # fixed step key -> deterministic mask/noise so the reconstruction loss
    # curve is smooth enough to assert descent over few iterations
    kd, kg = jax.random.PRNGKey(2), jax.random.PRNGKey(3)
    recs = []
    for i in range(40):
        state, _ = steps.jit_d_step(state, batch, kd)
        state, gm = steps.jit_g_step(state, batch, kg)
        recs.append(float(gm["rec"]))
    head = np.mean(recs[:5])
    tail = np.mean(recs[-5:])
    assert tail < head, f"rec did not decrease: {head} -> {tail}"


def test_wgan_steps_and_clipping():
    cfg = WGanConfig(image_size=32, noise_dim=16, ngf=8, ndf=8, num_layers=2,
                     clipping_limit=0.03, num_critics=2)
    tc = TrainConfig(batch_size=4, optimizer="rmsprop", lr=(5e-5,),
                     scheduler="const")
    steps = WGanSteps(cfg, tc, iters_per_epoch=10, num_epochs=2)
    state = steps.init_state(jax.random.PRNGKey(0))
    batches = {"imgs": jax.random.uniform(jax.random.PRNGKey(1),
                                          (2, 4, 32, 32, 3), minval=-1,
                                          maxval=1)}
    state, metrics = steps.jit_super_step(state, batches, jax.random.PRNGKey(2))
    assert np.isfinite(float(metrics["w_dist"]))
    assert np.isfinite(float(metrics["g_loss"]))
    img = steps.jit_sample(state, jax.random.normal(jax.random.PRNGKey(3),
                                                    (2, 16)))
    assert img.shape == (2, 32, 32, 3)
    assert float(jnp.abs(img).max()) <= 1.0

    clipped = clip_tree(state.D.params, 0.01)
    mx = max(float(jnp.abs(l).max())
             for l in jax.tree_util.tree_leaves(clipped))
    assert mx <= 0.01 + 1e-6


def test_wgan_gp_variant():
    """WGAN-GP (the reference's empty wgan_gp_model.py placeholder)."""
    cfg = WGanConfig(image_size=32, noise_dim=16, ngf=8, ndf=8, num_layers=2,
                     num_critics=2)
    tc = TrainConfig(batch_size=4, optimizer="adam", lr=(1e-4,),
                     scheduler="const")
    steps = WGanSteps(cfg, tc, iters_per_epoch=10, num_epochs=2,
                      gp_weight=10.0)
    state = steps.init_state(jax.random.PRNGKey(0))
    batches = {"imgs": jax.random.uniform(jax.random.PRNGKey(1),
                                          (2, 4, 32, 32, 3), minval=-1,
                                          maxval=1)}
    state, metrics = steps.jit_super_step(state, batches, jax.random.PRNGKey(2))
    assert np.isfinite(float(metrics["w_dist"]))
    assert np.isfinite(float(metrics["g_loss"]))
    # GP mode must NOT clip weights: run several steps, weights may exceed
    # the default clipping_limit
    for i in range(3):
        state, metrics = steps.jit_super_step(state, batches,
                                              jax.random.PRNGKey(3 + i))
    mx = max(float(jnp.abs(l).max())
             for l in jax.tree_util.tree_leaves(state.D.params))
    assert mx > cfg.clipping_limit
