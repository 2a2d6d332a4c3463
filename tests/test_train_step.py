"""End-to-end train-step tests on tiny shapes: losses finite, parameters move,
alternating schedule works, and the loss decreases on a synthetic task
(the fixed-seed regression strategy SURVEY.md §4 recommends)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from de_i2i_gan_tpu.config import DefectGanConfig, TrainConfig
from de_i2i_gan_tpu.train.steps import DefectGanSteps

SMALL = DefectGanConfig(image_size=32, label_nc=3, ngf=8, ndf=8, num_scales=2,
                        num_res=2, hidden_nc=16, embed_nc=12, num_embeds=2,
                        num_layers=2)
TC = TrainConfig(batch_size=2, num_critics=2, lr=(2e-4, 1e-4))


def _batch(key, b=2, s=32, l=3, with_embeds=False, cfg=SMALL):
    k1, k2, k3 = jax.random.split(key, 3)
    batch = {
        "bg": jax.random.uniform(k1, (b, s, s, 3), minval=-1, maxval=1),
        "df": jax.random.uniform(k2, (b, s, s, 3), minval=-1, maxval=1),
        "df_labels": jax.nn.one_hot(
            jax.random.randint(k3, (b,), 1, l), l),
    }
    if with_embeds:
        batch["df_embeds"] = jax.random.normal(
            k1, (b, cfg.num_embeds, cfg.embed_nc))
        batch["nm_embeds"] = jax.random.normal(
            k2, (b, cfg.num_embeds, cfg.embed_nc))
    return batch


@pytest.mark.parametrize("style", ["spade", "sean", "adain"])
def test_d_g_steps_all_styles(style):
    cfg = SMALL.replace(style_norm_block_type=style, add_noise=True,
                        use_spectral=True)
    steps = DefectGanSteps(cfg, TC, iters_per_epoch=10, num_epochs=2)
    state = steps.init_state(jax.random.PRNGKey(0))
    batch = _batch(jax.random.PRNGKey(1), with_embeds=(style == "sean"))

    def tree_sum(t):
        return jax.tree_util.tree_reduce(
            lambda a, l: a + float(jnp.sum(jnp.abs(l))), t, 0.0)

    # the step functions donate the input state (TPU memory reuse), so
    # fingerprint params before stepping
    d_sum0, g_sum0 = tree_sum(state.D.params), tree_sum(state.G.params)
    state2, dm = steps.jit_d_step(state, batch, jax.random.PRNGKey(2))
    assert np.isfinite(float(dm["gan_D"])) and np.isfinite(float(dm["clf_D"]))
    assert int(state2.step) == 1
    assert tree_sum(state2.D.params) != d_sum0  # D moved
    assert tree_sum(state2.G.params) == g_sum0  # G untouched

    state3, gm = steps.jit_g_step(state2, batch, jax.random.PRNGKey(3))
    for k in ("gan_G", "clf_G", "rec", "sd_cyc", "sd_con"):
        assert np.isfinite(float(gm[k])), k
    assert tree_sum(state3.G.params) != g_sum0  # G moved


def test_super_step_schedule():
    steps = DefectGanSteps(SMALL, TC, iters_per_epoch=10, num_epochs=2)
    state = steps.init_state(jax.random.PRNGKey(0))
    batches = jax.tree_util.tree_map(
        lambda *xs: jnp.stack(xs),
        *[_batch(jax.random.PRNGKey(i)) for i in range(TC.num_critics)])
    state2, metrics = steps.jit_super_step(state, batches,
                                           jax.random.PRNGKey(7))
    assert int(state2.step) == TC.num_critics
    assert np.isfinite(float(metrics["gan_D"]))
    assert np.isfinite(float(metrics["rec"]))


def test_rec_loss_decreases_on_fixed_batch():
    # identity-ish synthetic task: with constant batches the reconstruction
    # (cycle) loss must trend down over a few dozen G steps
    cfg = SMALL.replace(style_norm_block_type="spade")
    tc = TrainConfig(batch_size=2, num_critics=1, lr=(2e-4, 2e-4),
                     loss_weight=(2, 5, 5, 5, 1))
    steps = DefectGanSteps(cfg, tc, iters_per_epoch=100, num_epochs=10)
    state = steps.init_state(jax.random.PRNGKey(0))
    batch = _batch(jax.random.PRNGKey(1))
    key = jax.random.PRNGKey(2)
    first = last = None
    for i in range(30):
        key, kd, kg = jax.random.split(key, 3)
        state, _ = steps.jit_d_step(state, batch, kd)
        state, gm = steps.jit_g_step(state, batch, kg)
        if i == 0:
            first = float(gm["rec"])
        last = float(gm["rec"])
    assert last < first, f"rec did not decrease: {first} -> {last}"


def test_generate_shapes_and_ema():
    tc = TrainConfig(batch_size=2, num_critics=1, ema_decay=0.999)
    steps = DefectGanSteps(SMALL, tc, iters_per_epoch=10, num_epochs=2)
    state = steps.init_state(jax.random.PRNGKey(0))
    assert state.ema_G is not None
    batch = _batch(jax.random.PRNGKey(1))
    state, _ = steps.jit_g_step(state, batch, jax.random.PRNGKey(2))
    img, prob = steps.jit_generate(state, batch["bg"], batch["df_labels"])
    assert img.shape == batch["bg"].shape
    assert prob.shape == (*batch["bg"].shape[:3], 1)
    img_ema, _ = steps.jit_generate(state, batch["bg"], batch["df_labels"],
                                    use_ema=True)
    assert not np.allclose(np.asarray(img), np.asarray(img_ema))


def test_u8_super_batch_matches_f32():
    """A u8-quantized super-batch through the real super_step must produce
    the same update as its f32 reconstruction (images_to_float at the step
    entry is exactly the inverse of dl_next_u8's quantization)."""
    import numpy as np
    from de_i2i_gan_tpu.config import DefectGanConfig, TrainConfig
    from de_i2i_gan_tpu.train.steps import DefectGanSteps

    cfg = DefectGanConfig(image_size=16, label_nc=3, ngf=4, ndf=4,
                          num_scales=1, num_res=2, hidden_nc=8, num_layers=2)
    tcfg = TrainConfig(batch_size=2, num_critics=2, lr=(2e-4, 1e-4))
    steps = DefectGanSteps(cfg, tcfg, iters_per_epoch=10, num_epochs=1)

    k = jax.random.PRNGKey(1)
    u8 = {"bg": jax.random.randint(k, (2, 2, 16, 16, 3), 0, 256,
                                   jnp.uint8),
          "df": jax.random.randint(jax.random.PRNGKey(2),
                                   (2, 2, 16, 16, 3), 0, 256, jnp.uint8),
          "df_labels": jnp.tile(jnp.eye(3)[1][None, None], (2, 2, 1))}
    f32 = {**u8,
           "bg": u8["bg"].astype(jnp.float32) / 127.5 - 1.0,
           "df": u8["df"].astype(jnp.float32) / 127.5 - 1.0}

    s_u8, m_u8 = steps.super_step(steps.init_state(jax.random.PRNGKey(0)),
                                  u8, jax.random.PRNGKey(3))
    s_f32, m_f32 = steps.super_step(steps.init_state(jax.random.PRNGKey(0)),
                                    f32, jax.random.PRNGKey(3))
    for key in m_u8:
        np.testing.assert_allclose(float(m_u8[key]), float(m_f32[key]),
                                   rtol=1e-5, err_msg=key)
    a = jax.tree_util.tree_leaves(s_u8.G.params)[0]
    b = jax.tree_util.tree_leaves(s_f32.G.params)[0]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
