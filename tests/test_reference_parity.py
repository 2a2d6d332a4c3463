"""Numerical parity against the actual reference implementation.

These tests import the reference PyTorch modules from /root/reference
(read-only mount, CPU torch), copy weights into our flax modules, and assert
forward-pass agreement. They are skipped when the reference isn't mounted
(end-user installs) — they exist to pin semantics, not as a runtime
dependency.
"""
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF = "/root/reference/defectGAN"
import os

pytestmark = pytest.mark.skipif(not os.path.isdir(REF),
                                reason="reference not mounted")
if os.path.isdir(REF) and REF not in sys.path:
    sys.path.insert(0, REF)

import jax
import jax.numpy as jnp

KEY = jax.random.PRNGKey(0)
RNG = np.random.default_rng(0)


def _t(x):  # NHWC numpy -> torch NCHW
    return torch.from_numpy(np.ascontiguousarray(x.transpose(0, 3, 1, 2)))


def _n(t):  # torch NCHW -> NHWC numpy
    return t.detach().numpy().transpose(0, 2, 3, 1)


def test_instance_norm_matches_torch():
    from de_i2i_gan_tpu.nn.normalization import instance_norm
    x = RNG.normal(size=(2, 8, 8, 4)).astype(np.float32) * 3 + 1
    ref = torch.nn.InstanceNorm2d(4, affine=False)(_t(x))
    out = instance_norm(jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out), _n(ref), atol=1e-5)


def test_conv_reflect_same_matches_torch():
    from de_i2i_gan_tpu.nn.layers import Conv2d
    x = RNG.normal(size=(1, 10, 10, 3)).astype(np.float32)
    w = RNG.normal(size=(7, 7, 3, 5)).astype(np.float32) * 0.1

    tconv = torch.nn.Conv2d(3, 5, 7, padding="same", padding_mode="reflect",
                            bias=False)
    tconv.weight.data = torch.from_numpy(w.transpose(3, 2, 0, 1))
    ref = tconv(_t(x))

    m = Conv2d(5, (7, 7), padding="same", padding_mode="reflect")
    out = m.apply({"params": {"kernel": jnp.asarray(w)}}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out), _n(ref), atol=1e-4)


def test_strided_conv_pad1_matches_torch():
    from de_i2i_gan_tpu.nn.layers import Conv2d
    x = RNG.normal(size=(1, 16, 16, 4)).astype(np.float32)
    w = RNG.normal(size=(4, 4, 4, 8)).astype(np.float32) * 0.1
    tconv = torch.nn.Conv2d(4, 8, 4, stride=2, padding=1,
                            padding_mode="reflect", bias=False)
    tconv.weight.data = torch.from_numpy(w.transpose(3, 2, 0, 1))
    ref = tconv(_t(x))
    m = Conv2d(8, (4, 4), (2, 2), 1, "reflect")
    out = m.apply({"params": {"kernel": jnp.asarray(w)}}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out), _n(ref), atol=1e-4)


def test_spade_matches_reference_module():
    from models.networks.normalization import SPADE as RefSPADE
    from de_i2i_gan_tpu.nn.normalization import SPADE

    label_nc, norm_nc, hidden = 6, 16, 32
    ref = RefSPADE(label_nc, norm_nc, hidden_nc=hidden,
                   norm_layer=torch.nn.InstanceNorm2d).eval()
    x = RNG.normal(size=(2, 16, 16, norm_nc)).astype(np.float32)
    labels = np.zeros((2, label_nc), np.float32)
    labels[0, 1] = 1
    labels[1, 2] = labels[1, 4] = 1

    with torch.no_grad():
        seg = torch.from_numpy(labels).reshape(2, label_nc, 1, 1)
        ref_out = ref(_t(x), seg)

    def cw(conv):  # torch conv weight -> flax kernel
        return conv.weight.detach().numpy().transpose(2, 3, 1, 0)

    params = {
        "mlp_shared": {"kernel": cw(ref.mlp_shared[0]),
                       "bias": ref.mlp_shared[0].bias.detach().numpy()},
        "mlp_gamma": {"kernel": cw(ref.mlp_gamma),
                      "bias": ref.mlp_gamma.bias.detach().numpy()},
        "mlp_beta": {"kernel": cw(ref.mlp_beta),
                     "bias": ref.mlp_beta.bias.detach().numpy()},
    }
    m = SPADE(norm_nc, label_nc, hidden)
    out = m.apply({"params": params}, jnp.asarray(x), jnp.asarray(labels))
    np.testing.assert_allclose(np.asarray(out), _n(ref_out), atol=2e-4,
                               rtol=2e-4)


def test_adain_matches_reference_module():
    from models.networks.normalization import AdaIN as RefAdaIN
    from de_i2i_gan_tpu.nn.normalization import AdaIN

    norm_nc, hidden = 12, 16
    ref = RefAdaIN(norm_nc, hidden_nc=hidden,
                   norm_layer=torch.nn.InstanceNorm2d,
                   denorm_type="linear").eval()
    x = RNG.normal(size=(2, 8, 8, norm_nc)).astype(np.float32)
    s = RNG.normal(size=(2, hidden)).astype(np.float32)
    with torch.no_grad():
        ref_out = ref(_t(x), torch.from_numpy(s))

    params = {
        "mlp_gamma": {"kernel": ref.mlp_gamma.weight.detach().numpy().T,
                      "bias": ref.mlp_gamma.bias.detach().numpy()},
        "mlp_beta": {"kernel": ref.mlp_beta.weight.detach().numpy().T,
                     "bias": ref.mlp_beta.bias.detach().numpy()},
    }
    m = AdaIN(norm_nc, hidden)
    out = m.apply({"params": params}, jnp.asarray(x), jnp.asarray(s))
    np.testing.assert_allclose(np.asarray(out), _n(ref_out), atol=2e-4,
                               rtol=2e-4)


def test_kl_with_logits_matches_reference():
    from utils.util import calc_kl_with_logits
    from de_i2i_gan_tpu.nn.normalization import _kl_with_logits

    p = RNG.normal(size=(4, 16)).astype(np.float32)
    q = RNG.normal(size=(4, 16)).astype(np.float32)
    ref = calc_kl_with_logits(torch.from_numpy(p), torch.from_numpy(q),
                              temperature=4.0)
    out = _kl_with_logits(jnp.asarray(p), jnp.asarray(q), 4.0)
    np.testing.assert_allclose(float(out), float(ref), rtol=1e-5)


def test_bce_matches_torch():
    from de_i2i_gan_tpu.losses.common import bce_logits, cce_logits
    logits = RNG.normal(size=(4, 6)).astype(np.float32) * 3
    targets = (RNG.random((4, 6)) > 0.5).astype(np.float32)
    ref = torch.nn.functional.binary_cross_entropy_with_logits(
        torch.from_numpy(logits), torch.from_numpy(targets))
    np.testing.assert_allclose(
        float(bce_logits(jnp.asarray(logits), jnp.asarray(targets))),
        float(ref), rtol=1e-6)
    probs = targets / targets.sum(1, keepdims=True).clip(1)
    ref2 = torch.nn.functional.cross_entropy(torch.from_numpy(logits),
                                             torch.from_numpy(probs))
    np.testing.assert_allclose(
        float(cce_logits(jnp.asarray(logits), jnp.asarray(probs))),
        float(ref2), rtol=1e-5)


def test_sean_latent_path_matches_reference_module():
    from models.networks.normalization import SEAN as RefSEAN
    from de_i2i_gan_tpu.nn.normalization import SEAN

    embed_nc, norm_nc, label_nc, hidden = 24, 8, 3, 16
    ref = RefSEAN(embed_nc, norm_nc, label_nc, hidden_nc=hidden,
                  norm_layer=torch.nn.InstanceNorm2d).eval()
    x = RNG.normal(size=(2, 8, 8, norm_nc)).astype(np.float32)
    labels = np.eye(label_nc, dtype=np.float32)[[0, 2]]
    feat = RNG.normal(size=(2, 4, embed_nc)).astype(np.float32)

    with torch.no_grad():
        ref_lat = ref(_t(x), torch.from_numpy(labels), None)
        ref_emb = ref(_t(x), torch.from_numpy(labels),
                      torch.from_numpy(feat))

    def lin(l):
        return {"kernel": l.weight.detach().numpy().T,
                "bias": l.bias.detach().numpy()}

    params = {"mlp_latent": lin(ref.mlp_latent[0]),
              "mlp_shared": lin(ref.mlp_shared[0]),
              "mlp_gamma": lin(ref.mlp_gamma),
              "mlp_beta": lin(ref.mlp_beta)}
    m = SEAN(embed_nc, norm_nc, label_nc, hidden)
    variables = m.init(KEY, jnp.asarray(x), jnp.asarray(labels),
                       jnp.asarray(feat))
    variables = {**variables, "params": params}
    out_lat = m.apply(variables, jnp.asarray(x), jnp.asarray(labels), None)
    np.testing.assert_allclose(np.asarray(out_lat), _n(ref_lat), atol=2e-4,
                               rtol=2e-4)
    out_emb = m.apply(variables, jnp.asarray(x), jnp.asarray(labels),
                      jnp.asarray(feat))
    np.testing.assert_allclose(np.asarray(out_emb), _n(ref_emb), atol=2e-4,
                               rtol=2e-4)


def test_shifted_mask_distribution_matches_reference():
    from utils.util import generate_shifted_mask as ref_mask
    from de_i2i_gan_tpu.utils.masks import generate_shifted_mask
    torch.manual_seed(0)
    ref = ref_mask((64, 3, 32, 32), 8, 0.75)
    ours = generate_shifted_mask(KEY, 64, 32, 32, 8, 0.75)
    # distributional agreement: visible fraction ~= 1 - mask_ratio
    assert abs(float(ref.mean()) - float(ours.mean())) < 0.06
    # same patch structure under the random shift
    assert ref.shape == (64, 1, 32, 32)
    assert ours.shape == (64, 32, 32, 1)
