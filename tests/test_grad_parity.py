"""Gradient-level train-step parity vs the reference (VERDICT r2 #4).

Forward parity (test_torch_import.py) proves the nets agree; this proves the
TRAINING DYNAMICS do: with identical weights and batch, the gradients our
d_loss_fn / g_loss_fn produce match torch autograd through the reference's
own networks under the reference's loss graph
(/root/reference/defectGAN/models/defectgan_model.py:173-292 — 4-term D BCE
+ clf, double-cycle G with rec/sd_cyc/sd_con), weighted exactly as
trainers/defectgan_trainer.py:23-27,148-154 combines them.

Gradient mapping: torch grads share the state_dict layout, and every
transform the weight converter applies (transposes, reshapes) is linear —
so running convert_defectgan_* ON THE GRAD DICT maps torch grads into our
param-tree layout for leaf-wise comparison.

use_spectral=False here: the reference runs FOUR separate D calls per loss,
each advancing the spectral-norm power iteration in-place, while we run one
batched call with a single iteration — with SN the two graphs see slightly
different sigma by construction (documented batching deviation,
steps.py d_loss_fn).
"""
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

from de_i2i_gan_tpu.config import DefectGanConfig, TrainConfig
from de_i2i_gan_tpu.train.steps import DefectGanSteps
from de_i2i_gan_tpu.train.state import GANTrainState, NetState
from de_i2i_gan_tpu.train.torch_import import (
    convert_defectgan_discriminator, convert_defectgan_generator)

RNG = np.random.default_rng(11)

CFG = DefectGanConfig(image_size=32, label_nc=4, ngf=8, ndf=8, num_scales=2,
                      num_res=2, hidden_nc=16, num_layers=2,
                      use_spectral=False)
TCFG = TrainConfig(batch_size=2, num_critics=1, lr=(1e-4,))


def _ref_opt():
    return types.SimpleNamespace(
        num_res=CFG.num_res, cycle_gan=CFG.cycle_gan, label_nc=CFG.label_nc,
        skip_conn=False, ngf=CFG.ngf, ndf=CFG.ndf, input_nc=3,
        num_scales=CFG.num_scales, use_spectral=False,
        style_norm_block_type="spade", hidden_nc=CFG.hidden_nc,
        embed_nc=CFG.embed_nc, style_distill=False, add_noise=False,
        num_layers=CFG.num_layers, image_size=CFG.image_size,
        sean_alpha=None, num_epochs=10, use_running_stats=False)


def _bce(logits, target):
    return torch.nn.functional.binary_cross_entropy_with_logits(
        logits, target)


def _setup():
    from models.networks.discriminator import DefectGanDiscriminator as RefD
    from models.networks.generator import DefectGanGenerator as RefG
    torch.manual_seed(0)  # deterministic init regardless of test order
    ref_g = RefG(_ref_opt()).train()
    ref_d = RefD(_ref_opt()).train()

    g_params, g_stats = convert_defectgan_generator(ref_g.state_dict(), CFG)
    d_params = convert_defectgan_discriminator(ref_d.state_dict(), CFG)

    steps = DefectGanSteps(CFG, TCFG, iters_per_epoch=10, num_epochs=2)
    state0 = steps.init_state(jax.random.PRNGKey(0))
    state = GANTrainState(
        G=NetState(g_params, {"batch_stats": g_stats}, state0.G.opt_state),
        D=NetState(d_params, state0.D.state, state0.D.opt_state),
        E=None, ema_G=None, step=state0.step)

    bg = RNG.normal(size=(2, 32, 32, 3)).astype(np.float32).clip(-1, 1)
    df = RNG.normal(size=(2, 32, 32, 3)).astype(np.float32).clip(-1, 1)
    df_labels = np.zeros((2, 4), np.float32)
    df_labels[0, 1] = 1
    df_labels[1, 2] = 1
    nm_labels = np.zeros_like(df_labels)
    nm_labels[:, 0] = 1
    batch = {"bg": jnp.asarray(bg), "df": jnp.asarray(df),
             "df_labels": jnp.asarray(df_labels)}
    t = {
        "bg": torch.from_numpy(bg.transpose(0, 3, 1, 2)),
        "df": torch.from_numpy(df.transpose(0, 3, 1, 2)),
        "df_seg": torch.from_numpy(df_labels).reshape(2, 4, 1, 1),
        "nm_seg": torch.from_numpy(nm_labels).reshape(2, 4, 1, 1),
        "df_labels": torch.from_numpy(df_labels),
        "nm_labels": torch.from_numpy(nm_labels),
    }
    return ref_g, ref_d, steps, state, batch, t


def _grad_dict(net):
    out = dict(net.state_dict())  # buffers pass through (ignored stats)
    for k, p in net.named_parameters():
        out[k] = p.grad if p.grad is not None else torch.zeros_like(p)
    return out


def _compare_trees(ours, theirs, what):
    """Relative-L2 per leaf: robust to f32 summation-order noise through the
    double-cycle graph (torch and XLA reduce in different orders); a loss-
    graph transcription error shows up as O(1) relative error."""
    flat_a = jax.tree_util.tree_leaves_with_path(ours)
    flat_b = jax.tree_util.tree_leaves_with_path(theirs)
    assert len(flat_a) == len(flat_b)
    for (pa, a), (_, b) in zip(flat_a, flat_b):
        a = np.asarray(a, np.float64)
        b = np.asarray(b, np.float64)
        if np.linalg.norm(a) < 1e-6 and np.linalg.norm(b) < 1e-6:
            continue  # mathematically-zero gradient; both sides pure noise
        rel = np.linalg.norm(a - b) / (np.linalg.norm(b) + 1e-12)
        assert rel < 2e-3, \
            f"{what}{jax.tree_util.keystr(pa)}: rel L2 {rel}"


def test_d_step_gradient_parity():
    ref_g, ref_d, steps, state, batch, t = _setup()

    # ---- reference D loss (defectgan_model.py:252-292) -----------------
    # mode 'discriminator' runs netD.train(), netG.eval() (model.py:87-89)
    ref_g.eval()
    with torch.no_grad():
        fake_df, _ = ref_g(t["bg"], t["df_seg"])
        fake_nm, _ = ref_g(t["df"], t["nm_seg"])
    fd_src, _ = ref_d(fake_df.detach())
    fn_src, _ = ref_d(fake_nm.detach())
    rd_src, rd_cls = ref_d(t["df"])
    rn_src, rn_cls = ref_d(t["bg"])
    gan = torch.stack([
        _bce(fd_src, torch.zeros_like(fd_src)),
        _bce(fn_src, torch.zeros_like(fn_src)),
        _bce(rd_src, torch.ones_like(rd_src)),
        _bce(rn_src, torch.ones_like(rn_src))]).mean()
    clf = torch.stack([
        _bce(rd_cls, t["df_labels"].view_as(rd_cls)),
        _bce(rn_cls, t["nm_labels"].view_as(rn_cls))]).mean()
    w = TCFG.loss_weight
    (gan + clf * w[0]).backward()

    ref_grads = convert_defectgan_discriminator(_grad_dict(ref_d), CFG)

    # ---- our D grads ----------------------------------------------------
    (_, _), grads = jax.value_and_grad(steps.d_loss_fn, has_aux=True)(
        state.D.params, state, batch, jax.random.PRNGKey(1))

    _compare_trees(grads, ref_grads, "D grad ")


def test_g_step_gradient_parity():
    ref_g, ref_d, steps, state, batch, t = _setup()

    # ---- reference G loss (defectgan_model.py:173-250) -----------------
    # mode 'generator' runs netD.eval(), netG.train() (model.py:83-85)
    ref_d.eval()
    fake_df, p_df = ref_g(t["bg"], t["df_seg"])
    rec_nm, p_rec_df = ref_g(fake_df, t["nm_seg"])
    fake_nm, p_nm = ref_g(t["df"], t["nm_seg"])
    rec_df, p_rec_nm = ref_g(fake_nm, t["df_seg"])
    fd_src, fd_cls = ref_d(fake_df)
    fn_src, fn_cls = ref_d(fake_nm)
    l1 = torch.nn.functional.l1_loss
    gan = torch.stack([_bce(fd_src, torch.ones_like(fd_src)),
                       _bce(fn_src, torch.ones_like(fn_src))]).mean()
    clf = torch.stack([
        _bce(fd_cls, t["df_labels"].view_as(fd_cls)),
        _bce(fn_cls, t["nm_labels"].view_as(fn_cls))]).mean()
    rec = torch.stack([l1(rec_df, t["df"]), l1(rec_nm, t["bg"])]).mean()
    sd_cyc = torch.stack([l1(p_df, p_rec_df), l1(p_nm, p_rec_nm)]).mean()
    zero = torch.zeros_like(p_df)
    sd_con = torch.stack([l1(p_df, zero), l1(p_nm, zero),
                          l1(p_rec_df, zero), l1(p_rec_nm, zero)]).mean()
    w = TCFG.loss_weight
    (gan + clf * w[1] + rec * w[2] + sd_cyc * w[3] + sd_con * w[4]).backward()

    ref_grads, _ = convert_defectgan_generator(_grad_dict(ref_g), CFG)

    # ---- our G grads ----------------------------------------------------
    (_, _), grads = jax.value_and_grad(steps.g_loss_fn, has_aux=True)(
        (state.G.params, None), state, batch, jax.random.PRNGKey(1))
    g_grads, _ = grads

    _compare_trees(g_grads, ref_grads, "G grad ")
