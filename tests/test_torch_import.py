"""Full-network parity: instantiate the reference torch DefectGAN generator /
discriminator, import their weights via train.torch_import, and assert
forward-pass agreement (eval mode). Skipped without the reference mount."""
import os
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")
REF = "/root/reference/defectGAN"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF),
                                reason="reference not mounted")
if os.path.isdir(REF) and REF not in sys.path:
    sys.path.insert(0, REF)

import jax
import jax.numpy as jnp

from de_i2i_gan_tpu.config import DefectGanConfig
from de_i2i_gan_tpu.train.torch_import import (
    convert_defectgan_discriminator, convert_defectgan_generator)

RNG = np.random.default_rng(7)


def _ref_opt(cfg):
    return types.SimpleNamespace(
        num_res=cfg.num_res, cycle_gan=cfg.cycle_gan, label_nc=cfg.label_nc,
        skip_conn=False, ngf=cfg.ngf, ndf=cfg.ndf, input_nc=3,
        num_scales=cfg.num_scales, use_spectral=cfg.use_spectral,
        style_norm_block_type=cfg.style_norm_block_type,
        hidden_nc=cfg.hidden_nc, embed_nc=cfg.embed_nc,
        style_distill=False, add_noise=False, num_layers=cfg.num_layers,
        image_size=cfg.image_size, sean_alpha=None, num_epochs=10,
        use_running_stats=False)


CFG = DefectGanConfig(image_size=32, label_nc=4, ngf=8, ndf=8, num_scales=2,
                      num_res=2, hidden_nc=16, num_layers=2)


def test_generator_forward_parity():
    from models.networks.generator import DefectGanGenerator as RefG
    ref = RefG(_ref_opt(CFG)).eval()

    from de_i2i_gan_tpu.models.generator import DefectGanGenerator
    gen = DefectGanGenerator(CFG)

    x = RNG.normal(size=(2, 32, 32, 3)).astype(np.float32).clip(-1, 1)
    labels = np.zeros((2, 4), np.float32)
    labels[:, 1] = 1

    with torch.no_grad():
        seg = torch.from_numpy(labels)
        ref_out, ref_prob = ref(
            torch.from_numpy(x.transpose(0, 3, 1, 2)), seg.reshape(2, 4, 1, 1))

    params, stats = convert_defectgan_generator(ref.state_dict(), CFG)
    out, prob = gen.apply({"params": params, "batch_stats": stats},
                          jnp.asarray(x), jnp.asarray(labels), train=False,
                          rngs={"noise": jax.random.PRNGKey(0)})
    np.testing.assert_allclose(
        np.asarray(out), ref_out.numpy().transpose(0, 2, 3, 1),
        atol=5e-4, rtol=5e-4)
    np.testing.assert_allclose(
        np.asarray(prob), ref_prob.numpy().transpose(0, 2, 3, 1),
        atol=5e-4, rtol=5e-4)


def test_discriminator_forward_parity():
    from models.networks.discriminator import DefectGanDiscriminator as RefD
    ref = RefD(_ref_opt(CFG)).eval()
    from de_i2i_gan_tpu.models.discriminator import DefectGanDiscriminator
    dis = DefectGanDiscriminator(CFG)

    x = RNG.normal(size=(2, 32, 32, 3)).astype(np.float32).clip(-1, 1)
    with torch.no_grad():
        ref_src, ref_cls = ref(torch.from_numpy(x.transpose(0, 3, 1, 2)))

    params = convert_defectgan_discriminator(ref.state_dict(), CFG)
    src, cls = dis.apply({"params": params}, jnp.asarray(x), train=False)
    np.testing.assert_allclose(
        np.asarray(src), ref_src.numpy().transpose(0, 2, 3, 1),
        atol=5e-4, rtol=5e-4)
    np.testing.assert_allclose(np.asarray(cls), ref_cls.numpy(), atol=5e-4,
                               rtol=5e-4)
