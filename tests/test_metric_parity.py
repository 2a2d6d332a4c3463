"""Numerical parity of the FID/LPIPS chain against torch-side networks.

The north star requires "FID within 2% of the PyTorch reference". These tests
push IDENTICAL random weights through the production converters
(load_torch_inception_weights / load_torch_lpips_weights) and assert feature
and metric agreement between our flax nets and torch-side NCHW replicas of
the reference's networks (tests/torch_ref_nets.py — torchvision is absent
from this image and the reference's metrics modules import it at module
level, so the reference files themselves cannot execute here; the replicas
reproduce the pytorch-fid topology of
/root/reference/defectGAN/metrics/inception.py:181-301 and the alexnet
feature stack of /root/reference/stargan-v2/metrics/lpips.py:20-35 with
torchvision-identical state_dict keys).

The weights are random — exactly what a converter-parity test needs: any
transpose, key-mapping, padding or pooling mistake produces gross feature
disagreement (the nets are 90+ layers deep).
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

RNG = np.random.default_rng(11)


@pytest.fixture(scope="module")
def inception_pair(tmp_path_factory):
    from tests.torch_ref_nets import FIDInceptionTorch
    torch.manual_seed(123)
    ref_model = FIDInceptionTorch().eval()
    # torch's default kaiming_uniform(a=sqrt(5)) shrinks activations ~0.6x
    # per conv; through 94 layers the features collapse to input-independent
    # constants and every FID is ~1e-13 (a vacuous test). He-init preserves
    # variance through the ReLU chain; BN stats/affines randomized so the
    # running-stat conversion is actually exercised.
    with torch.no_grad():
        for m in ref_model.modules():
            if isinstance(m, torch.nn.Conv2d):
                torch.nn.init.kaiming_normal_(m.weight, nonlinearity="relu")
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.uniform_(-0.2, 0.2)
                m.running_var.uniform_(0.5, 1.5)
                m.weight.uniform_(0.8, 1.2)
                m.bias.uniform_(-0.1, 0.1)
    path = tmp_path_factory.mktemp("w") / "fid_inception.pth"
    torch.save(ref_model.state_dict(), path)

    from de_i2i_gan_tpu.metrics.inception import (
        InceptionV3, load_torch_inception_weights)
    net = InceptionV3(output_blocks=(3,), resize_input=False)
    variables = net.init(jax.random.PRNGKey(0),
                         jnp.zeros((1, 299, 299, 3), jnp.float32))
    variables = load_torch_inception_weights(str(path), variables)
    return ref_model, net, variables


def _feats_torch(ref_model, x_nhwc):
    with torch.no_grad():
        t = torch.from_numpy(np.ascontiguousarray(
            x_nhwc.transpose(0, 3, 1, 2)))
        return ref_model(t).numpy()


def _feats_flax(net, variables, x_nhwc):
    return np.asarray(net.apply(variables, jnp.asarray(x_nhwc))[3])


def test_inception_feature_parity(inception_pair):
    ref_model, net, variables = inception_pair
    x = RNG.uniform(-1, 1, (3, 299, 299, 3)).astype(np.float32)
    ft = _feats_torch(ref_model, x)
    ff = _feats_flax(net, variables, x)
    assert ft.shape == ff.shape == (3, 2048)
    # features must be input-DEPENDENT or the comparison is vacuous
    assert np.abs(ft[0] - ft[1]).mean() > 1e-3 * (np.abs(ft).mean() + 1e-8)
    scale = np.abs(ft).mean() + 1e-8
    assert np.abs(ft - ff).max() / scale < 1e-3, \
        f"max rel dev {np.abs(ft - ff).max() / scale}"


def test_fid_end_to_end_within_2pct(inception_pair):
    """Same two image sets -> torch-activations + reference Frechet formula
    (fid_score.py:159-210: scipy sqrtm with eps-retry) vs our streaming
    ActivationStats + frechet_distance. North-star clause: within 2%."""
    from scipy import linalg
    from de_i2i_gan_tpu.metrics.fid import ActivationStats, frechet_distance

    ref_model, net, variables = inception_pair
    n = 24
    set_a = RNG.uniform(-1, 1, (n, 299, 299, 3)).astype(np.float32)
    set_b = np.clip(set_a + RNG.normal(0, 0.3, set_a.shape), -1, 1) \
        .astype(np.float32)

    # reference path (fid_score.py:192-210 semantics)
    fa = _feats_torch(ref_model, set_a)
    fb = _feats_torch(ref_model, set_b)
    mu1, s1 = fa.mean(0), np.cov(fa, rowvar=False)
    mu2, s2 = fb.mean(0), np.cov(fb, rowvar=False)
    covmean, _ = linalg.sqrtm(s1.dot(s2), disp=False)
    if not np.isfinite(covmean).all():
        eps = 1e-6
        offset = np.eye(s1.shape[0]) * eps
        covmean = linalg.sqrtm((s1 + offset).dot(s2 + offset))
    if np.iscomplexobj(covmean):
        covmean = covmean.real
    diff = mu1 - mu2
    ref_fid = float(diff.dot(diff) + np.trace(s1) + np.trace(s2)
                    - 2 * np.trace(covmean))

    # our path
    sa, sb = ActivationStats(2048), ActivationStats(2048)
    for i in range(0, n, 8):
        sa.update(_feats_flax(net, variables, set_a[i:i + 8]))
        sb.update(_feats_flax(net, variables, set_b[i:i + 8]))
    our_fid = frechet_distance(*sa.finalize(), *sb.finalize())

    # the distance must be non-degenerate (the sets really differ)
    assert ref_fid > 1e-3, f"degenerate features: ref_fid={ref_fid}"
    assert abs(our_fid - ref_fid) / ref_fid < 0.02, (our_fid, ref_fid)


def test_lpips_parity(tmp_path):
    """Random alexnet + random positive lin weights through
    load_torch_lpips_weights vs the reference LPIPS math on the torch side
    (stargan-v2/metrics/lpips.py:72-83: imagenet shift/scale for [-1,1]
    inputs, channel-unit-normalized feature diffs, learned 1x1, mean)."""
    from tests.torch_ref_nets import AlexNetFeaturesTorch
    torch.manual_seed(7)
    alex = AlexNetFeaturesTorch().eval()
    alex_path = tmp_path / "alexnet.pth"
    torch.save(alex.state_dict(), alex_path)

    channels = [64, 192, 384, 256, 256]
    lin_sd = {f"lpips_weights.{i}.main.1.weight":
              torch.rand(1, c, 1, 1) + 0.01 for i, c in enumerate(channels)}
    lin_path = tmp_path / "lpips_weights.ckpt"
    torch.save(lin_sd, lin_path)

    x = RNG.uniform(-1, 1, (2, 64, 64, 3)).astype(np.float32)
    y = RNG.uniform(-1, 1, (2, 64, 64, 3)).astype(np.float32)

    mu = torch.tensor([-0.030, -0.088, -0.188]).view(1, 3, 1, 1)
    sigma = torch.tensor([0.458, 0.448, 0.450]).view(1, 3, 1, 1)
    xt = (torch.from_numpy(np.ascontiguousarray(
        x.transpose(0, 3, 1, 2))) - mu) / sigma
    yt = (torch.from_numpy(np.ascontiguousarray(
        y.transpose(0, 3, 1, 2))) - mu) / sigma

    def tnorm(t, eps=1e-10):  # lpips.py:16-17
        return t * torch.rsqrt(torch.sum(t ** 2, dim=1, keepdim=True) + eps)

    with torch.no_grad():
        val = torch.zeros(())
        for i, (fx, fy) in enumerate(zip(alex(xt), alex(yt))):
            d = (tnorm(fx) - tnorm(fy)) ** 2
            w = lin_sd[f"lpips_weights.{i}.main.1.weight"]
            val = val + torch.mean(torch.nn.functional.conv2d(d, w))
        ref_val = float(val)

    from de_i2i_gan_tpu.metrics.lpips import LPIPS, load_torch_lpips_weights
    net, variables = LPIPS.init_variables(jax.random.PRNGKey(0), 64)
    variables = load_torch_lpips_weights(str(alex_path), str(lin_path),
                                         variables)
    ours = np.asarray(net.apply(variables, jnp.asarray(x), jnp.asarray(y)))
    our_val = float(ours.mean())

    assert abs(our_val - ref_val) / (abs(ref_val) + 1e-8) < 1e-3, \
        (our_val, ref_val)
