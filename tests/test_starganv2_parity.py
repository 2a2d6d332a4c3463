"""Numerical parity against the reference stargan-v2 torch modules.

The reference's core/model.py imports munch/skimage/transformers at module
level; light stubs satisfy them (we only exercise the pure-torch blocks).
Skipped without the reference mount.
"""
import os
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")
REF = "/root/reference/stargan-v2"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF),
                                reason="reference not mounted")


def _install_stubs():
    if "munch" not in sys.modules:
        munch = types.ModuleType("munch")

        class Munch(dict):
            def __getattr__(self, k):
                return self[k]

            def __setattr__(self, k, v):
                self[k] = v

        munch.Munch = Munch
        sys.modules["munch"] = munch
    if "skimage" not in sys.modules:
        sk = types.ModuleType("skimage")
        filt = types.ModuleType("skimage.filters")
        filt.gaussian = lambda *a, **k: a[0]
        sk.filters = filt
        sys.modules["skimage"] = sk
        sys.modules["skimage.filters"] = filt
    if "torchvision" not in sys.modules:
        import importlib.machinery as _m
        tv = types.ModuleType("torchvision")
        tv.__spec__ = _m.ModuleSpec("torchvision", None)
        tv.transforms = types.ModuleType("torchvision.transforms")
        tv.transforms.__spec__ = _m.ModuleSpec("torchvision.transforms", None)
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.transforms"] = tv.transforms


if os.path.isdir(REF):
    _install_stubs()
    if REF not in sys.path:
        sys.path.insert(0, REF)

import jax
import jax.numpy as jnp

RNG = np.random.default_rng(3)
KEY = jax.random.PRNGKey(0)


def _t(x):
    return torch.from_numpy(np.ascontiguousarray(x.transpose(0, 3, 1, 2)))


def _n(t):
    return t.detach().numpy().transpose(0, 2, 3, 1)


def _conv(c):
    out = {"kernel": c.weight.detach().numpy().transpose(2, 3, 1, 0)}
    if c.bias is not None:
        out["bias"] = c.bias.detach().numpy()
    return out


def _lin(l):
    return {"kernel": l.weight.detach().numpy().T,
            "bias": l.bias.detach().numpy()}


def test_resblk_parity():
    from core.model import ResBlk as RefResBlk
    from de_i2i_gan_tpu.models.starganv2 import ResBlk
    ref = RefResBlk(8, 16, normalize=True, downsample=True).eval()
    x = RNG.normal(size=(2, 16, 16, 8)).astype(np.float32)
    with torch.no_grad():
        ref_out = ref(_t(x))
    params = {
        "conv1": _conv(ref.conv1), "conv2": _conv(ref.conv2),
        "conv1x1": _conv(ref.conv1x1),
        "norm1": {"scale": ref.norm1.weight.detach().numpy(),
                  "bias": ref.norm1.bias.detach().numpy()},
        "norm2": {"scale": ref.norm2.weight.detach().numpy(),
                  "bias": ref.norm2.bias.detach().numpy()},
    }
    m = ResBlk(16, normalize=True, downsample=True)
    out = m.apply({"params": params}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out), _n(ref_out), atol=3e-4,
                               rtol=3e-4)


def test_adain_resblk_parity():
    from core.model import AdainResBlk as RefBlk
    from de_i2i_gan_tpu.models.starganv2 import _StyledResBlk
    ref = RefBlk(8, 16, style_dim=4, w_hpf=0, upsample=True).eval()
    x = RNG.normal(size=(2, 8, 8, 8)).astype(np.float32)
    s = RNG.normal(size=(2, 4)).astype(np.float32)
    with torch.no_grad():
        ref_out = ref(_t(x), torch.from_numpy(s))
    params = {
        "conv1": _conv(ref.conv1), "conv2": _conv(ref.conv2),
        "conv1x1": _conv(ref.conv1x1),
        "norm1": {"fc": _lin(ref.norm1.fc)},
        "norm2": {"fc": _lin(ref.norm2.fc)},
    }
    m = _StyledResBlk(16, "adain", style_dim=4, w_hpf=0.0, upsample=True)
    out = m.apply({"params": params}, jnp.asarray(x), jnp.asarray(s))
    np.testing.assert_allclose(np.asarray(out), _n(ref_out), atol=3e-4,
                               rtol=3e-4)


def test_mapping_network_parity():
    from core.model import MappingNetwork as RefM
    from de_i2i_gan_tpu.models.starganv2 import MappingNetwork
    ref = RefM(latent_dim=4, style_dim=8, num_domains=2).eval()
    z = RNG.normal(size=(3, 4)).astype(np.float32)
    y = np.asarray([0, 1, 0])
    with torch.no_grad():
        ref_s = ref(torch.from_numpy(z), torch.from_numpy(y))
    params = {}
    shared_lins = [m for m in ref.shared if isinstance(m, torch.nn.Linear)]
    for i, lin in enumerate(shared_lins):
        params[f"shared_{i}"] = _lin(lin)
    for d in range(2):
        lins = [m for m in ref.unshared[d]
                if isinstance(m, torch.nn.Linear)]
        for j, lin in enumerate(lins[:-1]):
            params[f"unshared_{d}_{j}"] = _lin(lin)
        params[f"unshared_{d}_out"] = _lin(lins[-1])
    m = MappingNetwork(latent_dim=4, style_dim=8, num_domains=2)
    s = m.apply({"params": params}, jnp.asarray(z), jnp.asarray(y))
    np.testing.assert_allclose(np.asarray(s), ref_s.numpy(), atol=2e-5,
                               rtol=2e-5)


def test_highpass_parity():
    from core.model import HighPass as RefHP
    from de_i2i_gan_tpu.models.starganv2 import high_pass
    ref = RefHP(w_hpf=2.0, device="cpu")
    x = RNG.normal(size=(1, 8, 8, 3)).astype(np.float32)
    with torch.no_grad():
        ref_out = ref(_t(x))
    out = high_pass(jnp.asarray(x), 2.0)
    np.testing.assert_allclose(np.asarray(out), _n(ref_out), atol=1e-5)


def test_r1_penalty_matches_reference():
    # reference r1_reg (solver.py:573-583): 0.5 * E[||dD(x)/dx||^2], computed
    # here directly with torch.autograd (importing core.solver drags in its
    # whole dependency tree)
    from de_i2i_gan_tpu.losses.common import r1_penalty

    lin = torch.nn.Linear(8 * 8 * 3, 1)
    x = RNG.normal(size=(2, 8, 8, 3)).astype(np.float32)
    xt = _t(x).requires_grad_()
    out = lin(xt.reshape(2, -1))
    grad = torch.autograd.grad(out.sum(), xt, create_graph=True)[0]
    ref = 0.5 * grad.pow(2).reshape(2, -1).sum(1).mean(0)

    w = lin.weight.detach().numpy()  # (1, C*H*W) over NCHW layout
    b = lin.bias.detach().numpy()

    def d_sum(imgs):  # imgs NHWC -> match torch's NCHW flatten order
        flat = jnp.transpose(imgs, (0, 3, 1, 2)).reshape(imgs.shape[0], -1)
        return (flat @ jnp.asarray(w.T) + jnp.asarray(b)).sum()

    out = r1_penalty(d_sum, jnp.asarray(x))
    np.testing.assert_allclose(float(out), float(ref), rtol=1e-5)
