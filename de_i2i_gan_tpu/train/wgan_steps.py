"""WGAN training steps: weight clipping and gradient penalty variants.

Mirrors /root/reference/defectGAN/trainers/wgan_trainer.py:18-138 and
models/wgan_model.py:8-21:
  * critic weights clipped to +/- clipping_limit before each D step
    (tree_map clamp — the functional form of WGanModel.weight_clipping)
  * Wasserstein losses: d_loss = mean(D(fake)) - mean(D(real)),
    g_loss = -mean(D(G(z)))
  * one G update every num_critics critic updates

The reference also ships an EMPTY models/wgan_gp_model.py (0 LoC) — the
WGAN-GP variant it never implemented. ``gp_weight > 0`` here enables the
standard interpolated gradient penalty (clean grad-of-grad in JAX) and
disables clipping, completing that placeholder.
"""
from __future__ import annotations

import functools
from typing import Dict

import jax
import jax.numpy as jnp
import optax

from de_i2i_gan_tpu.config import TrainConfig, WGanConfig
from de_i2i_gan_tpu.models.discriminator import WGanDiscriminator
from de_i2i_gan_tpu.models.generator import WGanGenerator
from de_i2i_gan_tpu.train.optim import make_optimizer
from de_i2i_gan_tpu.train.state import GANTrainState, NetState


def clip_tree(params, limit: float):
    return jax.tree_util.tree_map(
        lambda p: jnp.clip(p, -limit, limit), params)


class WGanSteps:
    def __init__(self, cfg: WGanConfig, tcfg: TrainConfig,
                 iters_per_epoch: int = 1000, num_epochs: int = 120,
                 gp_weight: float = 0.0):
        self.cfg, self.tcfg = cfg, tcfg
        self.gp_weight = gp_weight  # > 0: WGAN-GP (no weight clipping)
        self.G = WGanGenerator(cfg)
        self.D = WGanDiscriminator(cfg)
        self.tx_D = make_optimizer(tcfg, tcfg.lr_d, iters_per_epoch, num_epochs)
        self.tx_G = make_optimizer(tcfg, tcfg.lr_g, iters_per_epoch, num_epochs,
                                   update_every=cfg.num_critics)

    def init_state(self, rng: jax.Array) -> GANTrainState:
        cfg = self.cfg
        k_g, k_d = jax.random.split(rng)
        noise = jnp.zeros((2, cfg.noise_dim), jnp.float32)
        img = jnp.zeros((2, cfg.image_size, cfg.image_size, 3), jnp.float32)
        g_vars = self.G.init({"params": k_g}, noise, train=True)
        d_vars = self.D.init({"params": k_d}, img, train=True)
        g_state = {k: v for k, v in g_vars.items() if k != "params"}
        d_state = {k: v for k, v in d_vars.items() if k != "params"}
        return GANTrainState(
            G=NetState(g_vars["params"], g_state,
                       self.tx_G.init(g_vars["params"])),
            D=NetState(d_vars["params"], d_state,
                       self.tx_D.init(d_vars["params"])),
            E=None, ema_G=None, step=jnp.zeros((), jnp.int32))

    def _gen(self, params, g_state, noise, *, train):
        variables = {"params": params, **g_state}
        mutable = ["batch_stats"] if train else []
        img, mut = self.G.apply(variables, noise, train=train, mutable=mutable)
        return img, {**g_state, **mut}

    def d_step(self, state: GANTrainState, batch: Dict, rng: jax.Array):
        real = batch["imgs"]
        k_z, k_eps = jax.random.split(rng)
        noise = jax.random.normal(k_z, (real.shape[0], self.cfg.noise_dim))
        if self.gp_weight > 0:
            d_params = state.D.params
        else:
            # clip BEFORE the update (wgan_trainer.py:125)
            d_params = clip_tree(state.D.params, self.cfg.clipping_limit)

        def loss_fn(dp):
            fake, _ = self._gen(state.G.params, state.G.state, noise,
                                train=False)
            fake = jax.lax.stop_gradient(fake)
            # two sequential train-mode forwards, matching the reference's
            # netD(real) then netD(fake) (wgan_trainer.py:128-131): the
            # critic uses BatchNorm, so a single mixed real+fake batch would
            # compute joint statistics and change critic outputs/dynamics
            real_logits, mut = self.D.apply(
                {"params": dp, **state.D.state}, real, train=True,
                mutable=["batch_stats"])
            fake_logits, mut = self.D.apply(
                {"params": dp, **state.D.state, **mut}, fake, train=True,
                mutable=["batch_stats"])
            b = real.shape[0]
            w_dist = real_logits.mean() - fake_logits.mean()
            loss = -w_dist
            if self.gp_weight > 0:
                # interpolated gradient penalty: (||dD/dx_hat|| - 1)^2
                eps = jax.random.uniform(k_eps, (b, 1, 1, 1))
                x_hat = eps * real + (1 - eps) * fake

                def critic_sum(x):
                    return self.D.apply({"params": dp, **state.D.state}, x,
                                        train=False).sum()

                g = jax.grad(critic_sum)(x_hat)
                norms = jnp.sqrt(jnp.sum(jnp.square(
                    g.astype(jnp.float32)), axis=(1, 2, 3)) + 1e-12)
                loss = loss + self.gp_weight * jnp.mean(
                    jnp.square(norms - 1.0))
            return loss, ({**state.D.state, **mut}, w_dist)

        (_, (d_state, w_dist)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(d_params)
        updates, opt = self.tx_D.update(grads, state.D.opt_state, d_params)
        new_d = optax.apply_updates(d_params, updates)
        return state.replace(D=NetState(new_d, d_state, opt),
                             step=state.step + 1), {"w_dist": w_dist}

    def g_step(self, state: GANTrainState, batch: Dict, rng: jax.Array):
        noise = jax.random.normal(rng, (batch["imgs"].shape[0],
                                        self.cfg.noise_dim))

        def loss_fn(gp):
            fake, g_state = self._gen(gp, state.G.state, noise, train=True)
            logits = self.D.apply(
                {"params": state.D.params, **state.D.state}, fake, train=False)
            return -logits.mean(), g_state

        (g_loss, g_state), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.G.params)
        updates, opt = self.tx_G.update(grads, state.G.opt_state,
                                        state.G.params)
        return state.replace(
            G=NetState(optax.apply_updates(state.G.params, updates), g_state,
                       opt)), {"g_loss": g_loss}

    def super_step(self, state: GANTrainState, batches: Dict, rng: jax.Array):
        # u8 feed support (--native_loader): normalize on device; f32
        # passthrough (same hook as the DefectGAN/MAE/pix2pix steps)
        from de_i2i_gan_tpu.ops.fused import batch_images_to_float
        batches = batch_images_to_float(batches)

        def body(carry, sub):
            st, key = carry
            key, k = jax.random.split(key)
            st, m = self.d_step(st, sub, k)
            return (st, key), m

        (state, rng), dm = jax.lax.scan(body, (state, rng), batches)
        rng, k = jax.random.split(rng)
        last = jax.tree_util.tree_map(lambda x: x[-1], batches)
        state, gm = self.g_step(state, last, k)
        out = {k_: v.mean() for k_, v in dm.items()}
        out.update(gm)
        return state, out

    def sample(self, state: GANTrainState, noise: jax.Array):
        img, _ = self._gen(state.G.params, state.G.state, noise, train=False)
        return img

    @functools.cached_property
    def jit_super_step(self):
        return jax.jit(self.super_step, donate_argnums=0)

    @functools.cached_property
    def jit_sample(self):
        return jax.jit(self.sample)
