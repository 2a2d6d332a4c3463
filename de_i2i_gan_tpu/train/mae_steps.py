"""MAE-GAN pretraining steps.

Mirrors the reference's masked-autoencoder GAN pretraining of the DefectGAN
generator (/root/reference/defectGAN/models/defectgan_model.py:106-171,
361-383 and trainers/mae_trainer.py):
  * random shifted patch masks (utils/util.py:60-71) + learnable MaskToken
  * G objective: L1 reconstruction * w_rec + D-fooling BCE + classifier
    * w_clf_g (mae_trainer.py:123-139)
  * D objective: real/fake BCE mean + classifier-on-reals * w_clf_d
    (mae_trainer.py:149-158)
  * the mask-token parameters train with the G optimizer (mae_trainer.py:28)
    — here they are simply part of the G parameter tree {'net', 'token'}
  * split_training trains only reconstruction / only classifier
    (defectgan_model.py:119-120,157-158)

The resulting 'net' subtree warm-starts DefectGAN training via the
key-filtered checkpoint restore (--load_model_name semantics).
"""
from __future__ import annotations

import functools
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import optax

from de_i2i_gan_tpu.config import DefectGanConfig, MAEConfig, TrainConfig
from de_i2i_gan_tpu.losses.common import bce_logits, cal_loss, l1
from de_i2i_gan_tpu.models.discriminator import DefectGanDiscriminator
from de_i2i_gan_tpu.models.extractor import StyleExtractor
from de_i2i_gan_tpu.models.generator import DefectGanGenerator
from de_i2i_gan_tpu.nn.blocks import MaskToken
from de_i2i_gan_tpu.train.optim import make_optimizer
from de_i2i_gan_tpu.train.state import GANTrainState, NetState
from de_i2i_gan_tpu.utils.masks import generate_shifted_mask

Batch = Dict[str, jax.Array]


class MAESteps:
    def __init__(self, cfg: DefectGanConfig, mcfg: MAEConfig, tcfg: TrainConfig,
                 iters_per_epoch: int = 1000, num_epochs: int = 200):
        self.cfg, self.mcfg, self.tcfg = cfg, mcfg, tcfg
        self.G = DefectGanGenerator(cfg)
        self.D = DefectGanDiscriminator(cfg)
        self.token = MaskToken(mcfg.mask_token_type, mcfg.mask_ratio,
                               cfg.input_nc, cfg.image_size)
        self.E = StyleExtractor(cfg) if cfg.style_norm_block_type == "adain" else None

        self.tx_D = make_optimizer(tcfg, tcfg.lr_d, iters_per_epoch, num_epochs)
        self.tx_G = make_optimizer(tcfg, tcfg.lr_g, iters_per_epoch, num_epochs,
                                   update_every=tcfg.num_critics)
        self.tx_E = (make_optimizer(tcfg, tcfg.lr_g, iters_per_epoch,
                                    num_epochs, update_every=tcfg.num_critics)
                     if self.E is not None else None)
        # MAE loss weights [rec, clf_d, clf_g] (defectgan_options.py:174-175)
        assert len(tcfg.loss_weight) == 3, "MAE loss_weight must have 3 entries"
        self.w_rec, self.w_clf_d, self.w_clf_g = tcfg.loss_weight

    # ------------------------------------------------------------------ init
    def init_state(self, rng: jax.Array) -> GANTrainState:
        cfg = self.cfg
        b = 2
        img = jnp.zeros((b, cfg.image_size, cfg.image_size, cfg.input_nc),
                        jnp.float32)
        labels = jnp.zeros((b, cfg.label_nc), jnp.float32)
        masks = jnp.ones((b, cfg.image_size, cfg.image_size, 1), jnp.float32)
        feat = self._dummy_feat(b)
        k_g, k_d, k_t, k_e, k_n = jax.random.split(rng, 5)
        g_vars = self.G.init({"params": k_g, "noise": k_n, "latent": k_n},
                             img, labels, feat, train=True)
        t_vars = self.token.init({"params": k_t}, img, masks)
        g_params = {"net": g_vars["params"],
                    "token": t_vars.get("params", {})}
        g_state = {k: v for k, v in g_vars.items() if k != "params"}

        d_vars = self.D.init({"params": k_d}, img, train=True)
        d_state = {k: v for k, v in d_vars.items() if k != "params"}

        e_net = None
        if self.E is not None:
            e_vars = self.E.init({"params": k_e, "latent": k_n}, img, labels,
                                 train=True)
            e_params = e_vars["params"]
            e_state = {k: v for k, v in e_vars.items() if k != "params"}
            e_net = NetState(e_params, e_state, self.tx_E.init(e_params))

        return GANTrainState(
            G=NetState(g_params, g_state, self.tx_G.init(g_params)),
            D=NetState(d_vars["params"], d_state, self.tx_D.init(d_vars["params"])),
            E=e_net, ema_G=None, step=jnp.zeros((), jnp.int32))

    def _dummy_feat(self, b: int):
        cfg = self.cfg
        if cfg.style_norm_block_type == "sean":
            return jnp.zeros((b, cfg.num_embeds, cfg.embed_nc), jnp.float32)
        if cfg.style_norm_block_type == "adain":
            return jnp.zeros((b, cfg.hidden_nc), jnp.float32)
        return None

    # --------------------------------------------------------------- repair
    def _style_feat(self, batch, e_params, e_state, imgs, labels, rng, stop_e):
        cfg = self.cfg
        if cfg.style_norm_block_type == "spade":
            return None
        if cfg.style_norm_block_type == "sean":
            return batch.get("embeds")
        feat = self.E.apply({"params": e_params, **e_state}, imgs, labels,
                            rngs={"latent": rng})
        return jax.lax.stop_gradient(feat) if stop_e else feat

    def repair(self, g_params, g_state, imgs, labels, style_feat, rng, *,
               train: bool, mask: Optional[jax.Array] = None):
        """Mask -> token fill -> generator reconstruction
        (defectgan_model.py:361-383)."""
        k_m, k_n = jax.random.split(rng)
        b, h, w, _ = imgs.shape
        if mask is None:
            mask = generate_shifted_mask(k_m, b, h, w, self.mcfg.patch_size,
                                         self.mcfg.mask_ratio)
        masked = self.token.apply({"params": g_params["token"]}, imgs, mask)
        variables = {"params": g_params["net"], **g_state}
        mutable = ["batch_stats", "spectral"] if train else []
        (pred, _), mut = self.G.apply(
            variables, masked, labels, style_feat, train=train,
            mutable=mutable, rngs={"noise": k_n, "latent": k_n})
        return pred, mask, {**g_state, **mut}

    # ---------------------------------------------------------------- steps
    def g_loss_fn(self, ge_params, state: GANTrainState, batch: Batch,
                  rng: jax.Array):
        g_params, e_params = ge_params
        imgs, labels = batch["imgs"], batch["labels"]
        k_feat, k_rep = jax.random.split(rng)
        e_state = state.E.state if state.E is not None else None
        feat = self._style_feat(batch, e_params, e_state, imgs, labels,
                                k_feat, stop_e=False)
        pred, _, g_state = self.repair(g_params, state.G.state, imgs, labels,
                                       feat, k_rep, train=True)
        rec = l1(pred, imgs)
        if self.mcfg.split_training:
            gan = jnp.zeros(())
            clf = jnp.zeros(())
        else:
            (src, cls), _ = self.D.apply(
                {"params": state.D.params, **state.D.state}, pred,
                train=False, mutable=[])
            gan = bce_logits(src, jnp.ones_like(src))
            clf = cal_loss(cls, labels, self.tcfg.clf_loss_type)
        loss = gan + rec * self.w_rec + clf * self.w_clf_g
        return loss, (g_state, {"rec": rec, "gan_G": gan, "clf_G": clf})

    def d_loss_fn(self, d_params, state: GANTrainState, batch: Batch,
                  rng: jax.Array):
        imgs, labels = batch["imgs"], batch["labels"]
        k_feat, k_rep = jax.random.split(rng)
        e_params = state.E.params if state.E is not None else None
        e_state = state.E.state if state.E is not None else None
        feat = self._style_feat(batch, e_params, e_state, imgs, labels,
                                k_feat, stop_e=True)
        if self.mcfg.split_training:
            (_, cls), d_state = self._d_apply(d_params, state.D.state, imgs)
            clf = cal_loss(cls, labels, self.tcfg.clf_loss_type)
            return clf * self.w_clf_d, (d_state, {"gan_D": jnp.zeros(()),
                                                  "clf_D": clf})
        pred, _, _ = self.repair(state.G.params, state.G.state, imgs, labels,
                                 feat, k_rep, train=False)
        pred = jax.lax.stop_gradient(pred)
        duo = jnp.concatenate([pred, imgs], axis=0)
        (src, cls), d_state = self._d_apply(d_params, state.D.state, duo)
        b = imgs.shape[0]
        fake_src, real_src = src[:b], src[b:]
        real_cls = cls[b:]
        gan = (bce_logits(fake_src, jnp.zeros_like(fake_src)) +
               bce_logits(real_src, jnp.ones_like(real_src))) / 2.0
        clf = cal_loss(real_cls, labels, self.tcfg.clf_loss_type)
        return gan + clf * self.w_clf_d, (d_state, {"gan_D": gan, "clf_D": clf})

    def _d_apply(self, d_params, d_state, x):
        (src, cls), mut = self.D.apply({"params": d_params, **d_state}, x,
                                       train=True, mutable=["spectral"])
        return (src, cls), {**d_state, **mut}

    def d_step(self, state: GANTrainState, batch: Batch, rng: jax.Array):
        from de_i2i_gan_tpu.ops.fused import batch_images_to_float
        batch = batch_images_to_float(batch)
        (_, (d_state, metrics)), grads = jax.value_and_grad(
            self.d_loss_fn, has_aux=True)(state.D.params, state, batch, rng)
        updates, opt = self.tx_D.update(grads, state.D.opt_state, state.D.params)
        return state.replace(
            D=NetState(optax.apply_updates(state.D.params, updates), d_state, opt),
            step=state.step + 1), metrics

    def g_step(self, state: GANTrainState, batch: Batch, rng: jax.Array):
        from de_i2i_gan_tpu.ops.fused import batch_images_to_float
        batch = batch_images_to_float(batch)
        e_params = state.E.params if state.E is not None else None
        (_, (g_state, metrics)), grads = jax.value_and_grad(
            self.g_loss_fn, has_aux=True)((state.G.params, e_params), state,
                                          batch, rng)
        g_grads, e_grads = grads
        updates, g_opt = self.tx_G.update(g_grads, state.G.opt_state,
                                          state.G.params)
        g_params = optax.apply_updates(state.G.params, updates)
        new_e = state.E
        if state.E is not None:
            e_updates, e_opt = self.tx_E.update(e_grads, state.E.opt_state,
                                                state.E.params)
            new_e = NetState(optax.apply_updates(state.E.params, e_updates),
                             state.E.state, e_opt)
        return state.replace(G=NetState(g_params, g_state, g_opt), E=new_e), \
            metrics

    def super_step(self, state: GANTrainState, batches: Batch, rng: jax.Array):
        """num_critics D updates + one G update (mae num_critics default 1)."""
        def body(carry, sub):
            st, key = carry
            key, k = jax.random.split(key)
            st, m = self.d_step(st, sub, k)
            return (st, key), m

        (state, rng), dm = jax.lax.scan(body, (state, rng), batches)
        last = jax.tree_util.tree_map(lambda x: x[-1], batches)
        rng, k = jax.random.split(rng)
        state, gm = self.g_step(state, last, k)
        out = {k_: v.mean() for k_, v in dm.items()}
        out.update(gm)
        return state, out

    def eval_losses(self, state: GANTrainState, batch: Batch, rng: jax.Array):
        """mae_inference (defectgan_model.py:131-147): losses without updates."""
        from de_i2i_gan_tpu.ops.fused import batch_images_to_float
        batch = batch_images_to_float(batch)
        imgs, labels = batch["imgs"], batch["labels"]
        k_feat, k_rep = jax.random.split(rng)
        e_params = state.E.params if state.E is not None else None
        e_state = state.E.state if state.E is not None else None
        feat = self._style_feat(batch, e_params, e_state, imgs, labels,
                                k_feat, stop_e=True)
        pred, _, _ = self.repair(state.G.params, state.G.state, imgs, labels,
                                 feat, k_rep, train=False)
        rec = l1(pred, imgs)
        (src, cls), _ = self.D.apply(
            {"params": state.D.params, **state.D.state}, pred, train=False,
            mutable=[])
        gan = bce_logits(src, jnp.ones_like(src))
        clf = cal_loss(cls, labels, self.tcfg.clf_loss_type)
        return {"rec": rec, "gan": gan, "clf": clf}

    def repair_grid(self, state: GANTrainState, imgs, labels, rng,
                    mask: Optional[jax.Array] = None):
        """[orig | combined | masked | pred | pred-masked] panels
        (defectgan_model.py:346-359), returned as a (B, 5, H, W, C) stack."""
        feat = None
        if self.cfg.style_norm_block_type == "adain" and state.E is not None:
            feat = self.E.apply({"params": state.E.params, **state.E.state},
                                imgs, labels, rngs={"latent": rng})
        pred, masks, _ = self.repair(state.G.params, state.G.state, imgs,
                                     labels, feat, rng, train=False, mask=mask)
        masked = imgs * masks
        pred_masked = pred * (1 - masks)
        combined = masked + pred_masked
        return jnp.stack([imgs, combined, masked, pred, pred_masked], axis=1)

    @functools.cached_property
    def jit_d_step(self):
        return jax.jit(self.d_step, donate_argnums=0)

    @functools.cached_property
    def jit_g_step(self):
        return jax.jit(self.g_step, donate_argnums=0)

    @functools.cached_property
    def jit_super_step(self):
        return jax.jit(self.super_step, donate_argnums=0)

    @functools.cached_property
    def jit_eval_losses(self):
        return jax.jit(self.eval_losses)
