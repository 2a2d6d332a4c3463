"""Metric math tests: streaming stats vs numpy, Frechet distance closed form,
IS bounds, Inception/LPIPS shapes."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from de_i2i_gan_tpu.metrics.fid import (
    ActivationStats, frechet_distance, inception_score, load_stats_npz,
    mfid_from_class_stats, save_stats_npz)


def test_streaming_stats_match_numpy(rng):
    x = rng.normal(size=(500, 16)).astype(np.float32)
    st = ActivationStats(16)
    for i in range(0, 500, 100):
        st.update(x[i:i + 100])
    mu, sigma = st.finalize()
    np.testing.assert_allclose(mu, x.mean(axis=0), atol=1e-5)
    np.testing.assert_allclose(sigma, np.cov(x, rowvar=False), atol=1e-4)


def test_frechet_identity_zero(rng):
    x = rng.normal(size=(300, 8))
    st = ActivationStats(8)
    st.update(x)
    mu, sigma = st.finalize()
    assert abs(frechet_distance(mu, sigma, mu, sigma)) < 1e-6


def test_frechet_mean_shift_closed_form(rng):
    # same covariance, shifted mean: FID == ||dmu||^2
    x = rng.normal(size=(2000, 4))
    st1, st2 = ActivationStats(4), ActivationStats(4)
    st1.update(x)
    st2.update(x + 3.0)
    mu1, s1 = st1.finalize()
    mu2, s2 = st2.finalize()
    d = frechet_distance(mu1, s1, mu2, s2)
    np.testing.assert_allclose(d, np.sum((mu1 - mu2) ** 2), rtol=1e-3)


def test_npz_roundtrip(tmp_path, rng):
    mu = rng.normal(size=8)
    sigma = np.eye(8)
    save_stats_npz(tmp_path / "s.npz", mu, sigma)
    mu2, sigma2 = load_stats_npz(tmp_path / "s.npz")
    np.testing.assert_array_equal(mu, mu2)


def test_inception_score_bounds(rng):
    # uniform predictions -> IS ~ 1; one-hot diverse -> IS ~ n_classes
    uniform = np.full((100, 10), 0.1)
    m, _ = inception_score(uniform, splits=2)
    assert abs(m - 1.0) < 1e-5
    onehot = np.eye(10)[rng.integers(0, 10, 200)] * 0.999 + 1e-4
    m2, _ = inception_score(onehot, splits=2)
    assert m2 > 5.0


def test_mfid(rng):
    real = {}
    fake = {}
    for key in ("a", "b"):
        x = rng.normal(size=(300, 6))
        st = ActivationStats(6)
        st.update(x)
        real[key] = st.finalize()
        fake[key] = x + (0.0 if key == "a" else 1.0)
    out = mfid_from_class_stats(real, fake)
    assert out["a"] < 0.05
    assert out["b"] > 1.0
    assert "mean" in out


def test_inception_forward_shapes():
    from de_i2i_gan_tpu.metrics.inception import InceptionV3
    net, variables = InceptionV3.init_variables(jax.random.PRNGKey(0),
                                                output_blocks=(0, 3))
    x = jax.random.uniform(jax.random.PRNGKey(1), (2, 64, 64, 3),
                           minval=-1, maxval=1)
    out = net.apply(variables, x)
    assert out[3].shape == (2, 2048)
    assert out[0].shape[-1] == 64


def test_lpips_properties():
    from de_i2i_gan_tpu.metrics.lpips import LPIPS, pairwise_lpips
    net, variables = LPIPS.init_variables(jax.random.PRNGKey(0), 32)
    x = jax.random.uniform(jax.random.PRNGKey(1), (2, 32, 32, 3),
                           minval=-1, maxval=1)
    y = jax.random.uniform(jax.random.PRNGKey(2), (2, 32, 32, 3),
                           minval=-1, maxval=1)
    d_same = net.apply(variables, x, x)
    d_diff = net.apply(variables, x, y)
    np.testing.assert_allclose(np.asarray(d_same), 0.0, atol=1e-5)
    assert (np.asarray(d_diff) > 0).all()
    apply = lambda a, b: net.apply(variables, a, b)
    batch = jax.random.uniform(jax.random.PRNGKey(3), (4, 32, 32, 3))
    v = pairwise_lpips(apply, batch)
    assert np.isfinite(float(v))


def test_evaluator_end_to_end(tmp_path):
    """Evaluator over a fake 'generator' (identity) on synthetic data."""
    from de_i2i_gan_tpu.metrics.evaluator import Evaluator
    from de_i2i_gan_tpu.metrics.fid import save_stats_npz
    from de_i2i_gan_tpu.data.pipeline import DataLoader, InfiniteLoader
    from de_i2i_gan_tpu.data.synthetic import SyntheticDefectDataset

    ev = Evaluator(dims=2048)
    df = DataLoader(SyntheticDefectDataset(image_size=32, length=8), 4)
    bg = InfiniteLoader(DataLoader(
        SyntheticDefectDataset(image_size=32, length=8,
                               data_type="background"), 4))
    real_stats = ev.dataset_statistics(
        DataLoader(SyntheticDefectDataset(image_size=32, length=8), 4),
        num_imgs=8)
    mu, sigma = real_stats.finalize()
    save_stats_npz(tmp_path / "real.npz", mu, sigma)

    out = ev.evaluate_generator(
        lambda bg_imgs, labels: bg_imgs,  # identity 'generator'
        bg, df, num_imgs=8, npz_path=tmp_path / "real.npz",
        metrics=("fid", "is", "lpips"), num_lpips_images=2)
    assert "fid" in out and np.isfinite(out["fid"])
    assert "is" in out and out["is"] >= 1.0
    assert "lpips" in out
