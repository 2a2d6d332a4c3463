"""Numeric/shape unit tests for the core block library, checked against the
reference semantics in defectGAN/models/networks/architecture.py and
normalization.py (torch run offline; invariants asserted here)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from de_i2i_gan_tpu.nn.layers import (
    Conv2d, Dense, avg_pool, max_pool, pad_image, upsample_nearest,
)
from de_i2i_gan_tpu.nn.normalization import (
    SPADE, SEAN, AdaIN, instance_norm, sean_label_index, sean_update_stats,
)
from de_i2i_gan_tpu.nn.blocks import (
    ConvBlock, DeConvBlock, MaskToken, NoiseInjection, NormConvBlock,
    NormResBlock, ResBlock,
)

KEY = jax.random.PRNGKey(0)


def test_instance_norm_zero_mean_unit_var():
    x = jax.random.normal(KEY, (2, 8, 8, 4)) * 3.0 + 5.0
    y = instance_norm(x)
    mean = jnp.mean(y, axis=(1, 2))
    var = jnp.var(y, axis=(1, 2))
    np.testing.assert_allclose(mean, np.zeros_like(mean), atol=1e-5)
    np.testing.assert_allclose(var, np.ones_like(var), atol=1e-3)


def test_conv_reflect_same_shape():
    m = Conv2d(16, (7, 7), padding="same", padding_mode="reflect")
    x = jnp.ones((2, 32, 32, 3))
    params = m.init(KEY, x)
    y = m.apply(params, x)
    assert y.shape == (2, 32, 32, 16)


def test_pad_image_matches_jnp_pad_small_axes():
    """Pad wider than the axis (tiny deep-layer feature maps at 64^2) must
    keep jnp.pad's repeated-reflection semantics, not assert (regression:
    the slice+flip fast path broke size-64 sweep training)."""
    import numpy as np
    for h, w, p in [(1, 1, 1), (2, 3, 3), (2, 2, 1), (4, 2, 3)]:
        x = jnp.arange(2 * h * w * 3, dtype=jnp.float32).reshape(2, h, w, 3)
        got = pad_image(x, ((p, p), (p, p)), "reflect")
        want = jnp.pad(x, ((0, 0), (p, p), (p, p), (0, 0)), mode="reflect")
        np.testing.assert_allclose(got, want)


def test_conv_stride2_pad1():
    m = Conv2d(8, (4, 4), (2, 2), 1, "reflect")
    x = jnp.ones((2, 32, 32, 3))
    y = m.apply(m.init(KEY, x), x)
    assert y.shape == (2, 16, 16, 8)


def test_conv_even_kernel_same_padding_torch_split():
    # 'same' with k=4 pads (1, 2) per dim (torch left=total//2)
    m = Conv2d(1, (4, 4), padding="same")
    x = jax.random.normal(KEY, (1, 8, 8, 1))
    y = m.apply(m.init(KEY, x), x)
    assert y.shape == (1, 8, 8, 1)


def test_spectral_norm_scales_to_unit_sigma():
    m = Conv2d(8, (3, 3), padding="same", use_spectral=True)
    x = jax.random.normal(KEY, (2, 8, 8, 4))
    variables = m.init(KEY, x)
    # run several power-iteration updates
    var = variables
    for _ in range(50):
        y, mut = m.apply(var, x, update_sn=True, mutable=["spectral"])
        var = {**var, "spectral": mut["spectral"]}
    kernel = var["params"]["kernel"]
    mat = np.asarray(kernel).reshape(-1, kernel.shape[-1]).T
    sigma = np.linalg.svd(mat, compute_uv=False)[0]
    u = np.asarray(var["spectral"]["kernel_u"])
    v = np.asarray(var["spectral"]["kernel_v"])
    est = u @ mat @ v
    np.testing.assert_allclose(est, sigma, rtol=1e-3)


def test_upsample_nearest():
    x = jnp.arange(4.0).reshape(1, 2, 2, 1)
    y = upsample_nearest(x)
    assert y.shape == (1, 4, 4, 1)
    np.testing.assert_array_equal(
        np.asarray(y[0, :, :, 0]),
        [[0, 0, 1, 1], [0, 0, 1, 1], [2, 2, 3, 3], [2, 2, 3, 3]])


def test_avg_max_pool():
    x = jnp.arange(16.0).reshape(1, 4, 4, 1)
    assert avg_pool(x).shape == (1, 2, 2, 1)
    np.testing.assert_allclose(avg_pool(x)[0, 0, 0, 0], (0 + 1 + 4 + 5) / 4)
    assert max_pool(x, 3, 2, 1).shape == (1, 2, 2, 1)


def test_spade_constant_fast_path_matches_naive():
    m = SPADE(norm_nc=16, label_nc=6, hidden_nc=32)
    x = jax.random.normal(KEY, (2, 16, 16, 16))
    labels = jnp.asarray([[1., 0, 1, 0, 0, 0], [0., 1, 0, 0, 1, 0]])
    params = m.init(KEY, x, labels)
    fast = m.apply(params, x, labels)
    # naive: broadcast the segmap to full resolution (reference
    # normalization.py:29 F.interpolate path)
    seg_full = jnp.broadcast_to(labels[:, None, None, :], (2, 16, 16, 6))
    naive = m.apply(params, x, seg_full)
    np.testing.assert_allclose(np.asarray(fast), np.asarray(naive),
                               rtol=2e-4, atol=2e-5)


def test_spade_modulation_identity_when_gamma_beta_zero():
    # gamma/beta conv kernels are gaussian-initialized; force them to zero and
    # confirm out == instance_norm(x) (out = normalized*(1+g)+b)
    m = SPADE(norm_nc=8, label_nc=3, hidden_nc=16)
    x = jax.random.normal(KEY, (2, 8, 8, 8))
    labels = jnp.ones((2, 3))
    params = m.init(KEY, x, labels)
    p = jax.tree_util.tree_map(jnp.zeros_like, params)
    y = m.apply(p, x, labels)
    np.testing.assert_allclose(np.asarray(y), np.asarray(instance_norm(x)),
                               atol=1e-5)


def test_adain_shapes():
    m = AdaIN(norm_nc=8, hidden_nc=16)
    x = jax.random.normal(KEY, (2, 8, 8, 8))
    s = jax.random.normal(KEY, (2, 16))
    y = m.apply(m.init(KEY, x, s), x, s)
    assert y.shape == x.shape


def test_sean_label_index():
    labels = jnp.asarray([[1., 0, 0, 0, 0, 0],
                          [0., 1, 0, 0, 0, 0],
                          [1., 0, 1, 0, 0, 0]])
    np.testing.assert_array_equal(np.asarray(sean_label_index(labels)), [1, 2, 5])


def test_sean_forward_paths_and_stats():
    m = SEAN(embed_nc=32, norm_nc=8, label_nc=3, hidden_nc=16)
    x = jax.random.normal(KEY, (4, 8, 8, 8))
    labels = jnp.asarray([[1., 0, 0], [1., 0, 0], [0., 1, 0], [0., 0, 1]])
    feat = jax.random.normal(KEY, (4, 5, 32))
    variables = m.init(KEY, x, labels, feat)

    # latent-only path (feat=None)
    y0 = m.apply(variables, x, labels, None)
    assert y0.shape == x.shape

    # embedding path with stat tracking
    y1, mut = m.apply(variables, x, labels, feat, track_stats=True,
                      mutable=["sean_stats"])
    stats = mut["sean_stats"]
    counts = np.asarray(stats["count"])
    assert counts[sean_label_index(labels[0:1])[0]] == 2  # two samples label 0
    assert counts.sum() == 4

    # finalize and sample from running stats
    new_stats = sean_update_stats(stats)
    assert np.asarray(new_stats["count"]).sum() == 0
    idx = int(np.asarray(sean_label_index(labels[0:1]))[0])
    assert np.any(np.asarray(new_stats["mean"])[idx] != 0)
    noise = jax.random.normal(KEY, (4, 16))
    y2 = m.apply({**variables, "sean_stats": new_stats}, x, labels, noise,
                 inference_stats=True)
    assert y2.shape == x.shape


def test_sean_zero_embed_fallback():
    # zero embeddings + zero mlp params -> enc path contributes exactly zero;
    # the fallback must reproduce the latent-only result
    m = SEAN(embed_nc=32, norm_nc=8, label_nc=3, hidden_nc=16)
    x = jax.random.normal(KEY, (2, 4, 4, 8))
    labels = jnp.asarray([[1., 0, 0], [0., 1, 0]])
    feat = jnp.zeros((2, 5, 32))
    variables = m.init(KEY, x, labels, feat)
    params = variables["params"]
    params = {**params, "mlp_shared": jax.tree_util.tree_map(
        jnp.zeros_like, params["mlp_shared"])}
    variables = {**variables, "params": params}
    with_embed = m.apply(variables, x, labels, feat)
    latent_only = m.apply(variables, x, labels, None)
    np.testing.assert_allclose(np.asarray(with_embed), np.asarray(latent_only),
                               atol=1e-6)


def test_noise_injection_zero_at_init():
    m = NoiseInjection()
    x = jax.random.normal(KEY, (2, 4, 4, 3))
    variables = m.init({"params": KEY, "noise": KEY}, x)
    y = m.apply(variables, x, rngs={"noise": jax.random.PRNGKey(7)})
    np.testing.assert_allclose(np.asarray(y), np.asarray(x))  # weight starts 0


@pytest.mark.parametrize("token_type,has_param", [
    ("zero", False), ("mean", False), ("scalar", True),
    ("vector", True), ("position", True), ("full", True),
])
def test_mask_token(token_type, has_param):
    m = MaskToken(token_type, mask_ratio=0.75, input_nc=3, image_size=16)
    imgs = jnp.ones((2, 16, 16, 3))
    masks = jnp.zeros((2, 16, 16, 1)).at[:, :8].set(1.0)
    variables = m.init(KEY, imgs, masks)
    assert bool(variables.get("params")) == has_param
    y = m.apply(variables, imgs, masks)
    assert y.shape == imgs.shape
    np.testing.assert_allclose(np.asarray(y[:, :8]), 1.0)  # visible kept


def test_resblock_shapes_and_downscale():
    x = jax.random.normal(KEY, (2, 16, 16, 8))
    m = ResBlock(8, (3, 3), "same", "reflect", norm="instance", act="leaky_relu")
    y = m.apply(m.init(KEY, x), x)
    assert y.shape == x.shape
    m2 = ResBlock(16, (3, 3), "same", "reflect", norm="instance",
                  act="leaky_relu", down_scale=True)
    y2 = m2.apply(m2.init(KEY, x), x)
    assert y2.shape == (2, 8, 8, 16)


def test_norm_blocks_all_style_types():
    x = jax.random.normal(KEY, (2, 8, 8, 16))
    labels = jnp.asarray([[1., 0, 0], [0., 1, 0]])
    feats = {"spade": None,
             "sean": jax.random.normal(KEY, (2, 5, 32)),
             "adain": jax.random.normal(KEY, (2, 24))}
    for style in ("spade", "sean", "adain"):
        m = NormConvBlock(style, 8, label_nc=3, hidden_nc=24, embed_nc=32,
                          up_scale=True, add_noise=True)
        rngs = {"params": KEY, "noise": KEY}
        v = m.init(rngs, x, labels, feats[style])
        y = m.apply(v, x, labels, feats[style], rngs={"noise": KEY})
        assert y.shape == (2, 16, 16, 8)

        mr = NormResBlock(style, 16, label_nc=3, hidden_nc=24, embed_nc=32,
                          add_noise=True)
        v = mr.init(rngs, x, labels, feats[style])
        y = mr.apply(v, x, labels, feats[style], rngs={"noise": KEY})
        assert y.shape == x.shape


def test_batchnorm_train_eval_distinction():
    m = ConvBlock(8, (3, 3), (1, 1), "same", norm="batch", act="leaky_relu")
    x = jax.random.normal(KEY, (4, 8, 8, 3)) * 2 + 1
    v = m.init(KEY, x, train=True)
    y_train, mut = m.apply(v, x, train=True, mutable=["batch_stats"])
    y_eval = m.apply(v, x, train=False)
    assert not np.allclose(np.asarray(y_train), np.asarray(y_eval))
    # running stats moved toward batch stats
    assert not np.allclose(np.asarray(mut["batch_stats"]["norm"]["mean"]), 0.0)
