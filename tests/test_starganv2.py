"""StarGAN v2 nets + solver tests at tiny sizes."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from de_i2i_gan_tpu.models.starganv2 import (
    Generator, MappingNetwork, ResBlk, SEANv2, StarGANv2Discriminator,
    StyleEncoder, high_pass)
from de_i2i_gan_tpu.train.solver import StarGANv2Config, StarGANv2Solver

KEY = jax.random.PRNGKey(0)
# tiny config: img 32 -> dim_in = 2**14/32 = 512 is too fat; use img 64 w/
# reduced max_conv_dim via config
CFG = StarGANv2Config(img_size=64, num_domains=3, style_dim=8, latent_dim=4,
                      hidden_nc=16, embed_nc=12, w_hpf=0.0, max_conv_dim=64,
                      batch_size=2, ds_iter=10, total_iters=10,
                      allow_degraded_losses=True)


def _batch(latent=True, sean=False):
    k = jax.random.PRNGKey(1)
    b = {
        "x_src": jax.random.uniform(k, (2, 64, 64, 3), minval=-1, maxval=1),
        "y_src": jnp.asarray([0, 1], jnp.int32),
        "y_ref": jnp.asarray([1, 2], jnp.int32),
        "x_ref": jax.random.uniform(k, (2, 64, 64, 3), minval=-1, maxval=1),
        "x_ref2": jax.random.uniform(jax.random.PRNGKey(2), (2, 64, 64, 3),
                                     minval=-1, maxval=1),
        "z_ref": jax.random.normal(k, (2, 4)),
        "z_ref2": jax.random.normal(jax.random.PRNGKey(3), (2, 4)),
        "z_src": jax.random.normal(jax.random.PRNGKey(4), (2, 4)),
    }
    if sean:
        b["s_ref"] = jax.random.normal(k, (2, 5, 12))
        b["s_ref2"] = jax.random.normal(jax.random.PRNGKey(5), (2, 5, 12))
        b["s_src"] = jax.random.normal(jax.random.PRNGKey(6), (2, 5, 12))
    return b


def test_resblk_sqrt2_scaling():
    m = ResBlk(8)
    x = jax.random.normal(KEY, (2, 8, 8, 8))
    v = m.init(KEY, x)
    y = m.apply(v, x)
    assert y.shape == x.shape


def test_mapping_and_style_encoder_domain_select():
    m = MappingNetwork(latent_dim=4, style_dim=8, num_domains=3)
    z = jax.random.normal(KEY, (2, 4))
    y = jnp.asarray([0, 2], jnp.int32)
    v = m.init(KEY, z, y)
    s = m.apply(v, z, y)
    assert s.shape == (2, 8)
    # same z, different domain -> different style
    s2 = m.apply(v, z, jnp.asarray([1, 1], jnp.int32))
    assert not np.allclose(np.asarray(s), np.asarray(s2))

    se = StyleEncoder(img_size=64, style_dim=8, num_domains=3, max_conv_dim=32)
    x = jax.random.uniform(KEY, (2, 64, 64, 3))
    v = se.init(KEY, x, y)
    assert se.apply(v, x, y).shape == (2, 8)


def test_discriminator_domain_indexing():
    d = StarGANv2Discriminator(img_size=64, num_domains=3, max_conv_dim=32)
    x = jax.random.uniform(KEY, (2, 64, 64, 3))
    v = d.init(KEY, x, jnp.asarray([0, 1], jnp.int32))
    out0 = d.apply(v, x, jnp.asarray([0, 0], jnp.int32))
    out1 = d.apply(v, x, jnp.asarray([1, 1], jnp.int32))
    assert out0.shape == (2,)
    assert not np.allclose(np.asarray(out0), np.asarray(out1))


def test_generator_adain_and_hpf():
    g = Generator(img_size=64, style_dim=8, max_conv_dim=32, w_hpf=1.0,
                  norm_type="adain")
    x = jax.random.uniform(KEY, (2, 64, 64, 3))
    s = jax.random.normal(KEY, (2, 8))
    masks = [jnp.ones((2, 32, 32, 1)), jnp.ones((2, 64, 64, 1))]
    v = g.init(KEY, x, s, masks=masks)
    out = g.apply(v, x, s, masks=masks)
    assert out.shape == (2, 64, 64, 3)


def test_generator_sean_layer_split():
    g = Generator(img_size=64, style_dim=8, max_conv_dim=32, w_hpf=0.0,
                  norm_type="sean", embed_nc=12, label_nc=3, hidden_nc=16)
    x = jax.random.uniform(KEY, (2, 64, 64, 3))
    s = jax.random.normal(KEY, (2, 5, 12))
    y = jnp.asarray([0, 2], jnp.int32)
    v = g.init(KEY, x, s, labels=y)
    out = g.apply(v, x, s, labels=y)
    assert out.shape == (2, 64, 64, 3)
    # layer-split: two styles, second used on listed decoder layers
    s2 = jnp.stack([s, s * 2.0], axis=1)  # (N, 2, E, embed)
    out_split = g.apply(v, x, s2, labels=y, layer_split_index=(0, 1))
    assert out_split.shape == (2, 64, 64, 3)
    assert not np.allclose(np.asarray(out), np.asarray(out_split), atol=1e-3)


def test_high_pass_dc_removal():
    x = jnp.full((1, 8, 8, 4), 3.0)
    y = high_pass(x, 1.0)
    # interior of a constant image filters to 0
    np.testing.assert_allclose(np.asarray(y[0, 2:-2, 2:-2]), 0.0, atol=1e-5)


def test_seanv2_stats_and_sampling():
    m = SEANv2(embed_nc=12, norm_nc=8, label_nc=3, hidden_nc=16)
    x = jax.random.normal(KEY, (4, 8, 8, 8))
    y = jnp.asarray([0, 0, 1, 2], jnp.int32)
    feat = jax.random.normal(KEY, (4, 5, 12))
    v = m.init(KEY, x, y, feat)
    out, mut = m.apply(v, x, y, feat, track_stats=True,
                       mutable=["sean_stats"])
    assert mut["sean_stats"]["count"][0] == 2
    # mix_alpha weighting
    alpha = jnp.ones((4, 5))
    out2 = m.apply(v, x, y, feat, mix_alpha=alpha)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out2), atol=1e-5)


@pytest.mark.parametrize("norm_type", ["adain", "sean"])
def test_solver_train_step(norm_type):
    cfg = StarGANv2Config(**{**CFG.__dict__, "norm_type": norm_type,
                             "num_embeds": 5})
    solver = StarGANv2Solver(cfg)
    state = solver.init_state(jax.random.PRNGKey(0))
    batch = _batch(sean=(norm_type == "sean"))
    state2, metrics = solver.jit_train_step(state, batch,
                                            jax.random.PRNGKey(7))
    assert int(state2.step) == 1
    for k, v in metrics.items():
        assert np.isfinite(float(v)), k
    assert "D/ref_reg" in metrics  # R1 present
    if norm_type == "adain":
        assert "G/latent_adv" in metrics
    # EMA moved toward params
    diff = jax.tree_util.tree_reduce(
        lambda a, l: a + float(jnp.sum(jnp.abs(l))),
        jax.tree_util.tree_map(lambda a, b: a - b, state2.ema_G,
                               state2.G.params), 0.0)
    assert diff > 0

    img = solver.jit_generate(state2, batch["x_src"],
                              batch["s_ref"] if norm_type == "sean"
                              else jax.random.normal(KEY, (2, 8)),
                              batch["y_ref"])
    assert img.shape == (2, 64, 64, 3)


def test_sean_inactive_sty_loss_is_hard_error():
    """sean without frozen-ViT embedding of x_fake would silently zero the
    lambda_sty term; strict-by-default this is a trace-time ValueError
    unless allow_degraded_losses (VERDICT-r3 weak #6)."""
    cfg = StarGANv2Config(**{**CFG.__dict__, "norm_type": "sean",
                             "num_embeds": 5,
                             "allow_degraded_losses": False})
    solver = StarGANv2Solver(cfg)
    state = solver.init_state(jax.random.PRNGKey(0))
    with pytest.raises(ValueError, match="lambda_sty"):
        solver.jit_train_step(state, _batch(latent=False, sean=True),
                              jax.random.PRNGKey(7))
