"""Paired image-to-image training with a multi-scale discriminator and
feature-matching loss (pix2pixHD-style).

This covers BASELINE.json configs #3/#4 ("full alternating G/D training loop
with L1 + adversarial loss on a paired edges2photos-style dataset",
"multi-scale discriminator + feature-matching/perceptual loss training at
512x512") — capabilities the north star asks of the framework beyond the
reference's unpaired StarGAN-style workloads.

  * generator: the DefectGAN encoder-decoder (composition disabled via
    cycle_gan=True returns the raw foreground; here we use the composed
    output as the translation)
  * discriminator: N PatchGAN discriminators over a scale pyramid
    (1, 1/2, 1/4, ...), each exposing intermediate features
  * losses: LSGAN or hinge adversarial + lambda_L1 * L1 +
    lambda_FM * multi-scale feature matching
"""
from __future__ import annotations

import functools
from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import linen as nn

from de_i2i_gan_tpu.config import DefectGanConfig, TrainConfig
from de_i2i_gan_tpu.losses.common import l1
from de_i2i_gan_tpu.models.generator import DefectGanGenerator
from de_i2i_gan_tpu.nn.blocks import ConvBlock
from de_i2i_gan_tpu.nn.layers import avg_pool
from de_i2i_gan_tpu.train.optim import ema_update, make_optimizer
from de_i2i_gan_tpu.train.state import GANTrainState, NetState


class PatchDiscriminatorFeatures(nn.Module):
    """70x70-ish PatchGAN that returns per-layer features + logits."""

    ndf: int = 64
    num_layers: int = 3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        feats = []
        h = ConvBlock(self.ndf, (4, 4), (2, 2), 1, act="leaky_relu",
                      dtype=self.dtype, name="stem")(x, train=train)
        feats.append(h)
        crt = self.ndf
        for i in range(self.num_layers):
            # k4/p1 on a <2px map would produce an EMPTY tensor (and NaN
            # means downstream); stop deepening at tiny test scales
            if h.shape[1] < 2:
                break
            crt = min(crt * 2, 512)
            stride = (2, 2) if i < self.num_layers - 1 else (1, 1)
            h = ConvBlock(crt, (4, 4), stride, 1, norm="instance",
                          act="leaky_relu", dtype=self.dtype,
                          name=f"layer_{i}")(h, train=train)
            feats.append(h)
        # k4/p1 yields an empty map below 3px (tiny test scales); fall back
        # to a 1x1 head there
        if h.shape[1] >= 3:
            logits = ConvBlock(1, (4, 4), (1, 1), 1, dtype=self.dtype,
                               name="head")(h, train=train)
        else:
            logits = ConvBlock(1, (1, 1), dtype=self.dtype,
                               name="head")(h, train=train)
        return logits, feats


class MultiScaleDiscriminator(nn.Module):
    """num_scales PatchGANs over an avg-pool pyramid (pix2pixHD)."""

    num_scales: int = 2
    ndf: int = 64
    num_layers: int = 3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        outs = []
        for s in range(self.num_scales):
            logits, feats = PatchDiscriminatorFeatures(
                self.ndf, self.num_layers, dtype=self.dtype,
                name=f"scale_{s}")(x, train=train)
            outs.append((logits, feats))
            if s + 1 < self.num_scales:
                x = avg_pool(x, 2, 2)
        return outs


def gan_loss(logits, target_real: bool, kind: str, for_disc: bool):
    lf = logits.astype(jnp.float32)
    if kind == "lsgan":
        t = 1.0 if target_real else 0.0
        return jnp.mean(jnp.square(lf - t))
    if kind == "hinge":
        if for_disc:
            return jnp.mean(nn.relu(1.0 - lf) if target_real
                            else nn.relu(1.0 + lf))
        return -jnp.mean(lf)
    raise ValueError(kind)


def feature_matching(real_feats: List[List[jax.Array]],
                     fake_feats: List[List[jax.Array]]) -> jax.Array:
    total = 0.0
    n = 0
    for rf, ff in zip(real_feats, fake_feats):
        for r, f in zip(rf, ff):
            total = total + l1(f, jax.lax.stop_gradient(r))
            n += 1
    return total / max(n, 1)


class Pix2PixSteps:
    """Paired i2i: batch = {'input': x, 'target': y}."""

    def __init__(self, cfg: DefectGanConfig, tcfg: TrainConfig,
                 num_d_scales: int = 2, gan_kind: str = "lsgan",
                 lambda_l1: float = 100.0, lambda_fm: float = 10.0,
                 iters_per_epoch: int = 1000, num_epochs: int = 100,
                 n_layers_d: int = 3, fused_prop: bool = False):
        self.cfg, self.tcfg = cfg, tcfg
        self.gan_kind = gan_kind
        self.lambda_l1 = lambda_l1
        self.lambda_fm = lambda_fm
        self.fused_prop = fused_prop
        self.G = DefectGanGenerator(cfg)
        self.D = MultiScaleDiscriminator(num_d_scales, cfg.ndf, n_layers_d,
                                         dtype=cfg.dtype)
        self.tx_G = make_optimizer(tcfg, tcfg.lr_g, iters_per_epoch,
                                   num_epochs)
        self.tx_D = make_optimizer(tcfg, tcfg.lr_d, iters_per_epoch,
                                   num_epochs)

    def init_state(self, rng: jax.Array) -> GANTrainState:
        cfg = self.cfg
        img = jnp.zeros((2, cfg.image_size, cfg.image_size, cfg.input_nc),
                        jnp.float32)
        labels = jnp.zeros((2, cfg.label_nc), jnp.float32)
        k_g, k_d, k_n = jax.random.split(rng, 3)
        g_vars = self.G.init({"params": k_g, "noise": k_n}, img, labels,
                             train=True)
        d_vars = self.D.init({"params": k_d},
                             jnp.concatenate([img, img], axis=-1), train=True)
        g_state = {k: v for k, v in g_vars.items() if k != "params"}
        ema = (jax.tree_util.tree_map(jnp.copy, g_vars["params"])
               if self.tcfg.ema_decay > 0 else None)
        return GANTrainState(
            G=NetState(g_vars["params"], g_state,
                       self.tx_G.init(g_vars["params"])),
            D=NetState(d_vars["params"], {}, self.tx_D.init(d_vars["params"])),
            E=None, ema_G=ema, step=jnp.zeros((), jnp.int32))

    def _gen(self, params, g_state, x, labels, rng, train):
        def fwd(params, g_state, x, labels, rng):
            variables = {"params": params, **g_state}
            mutable = ["batch_stats", "spectral"] if train else []
            (out, _), mut = self.G.apply(variables, x, labels, train=train,
                                         mutable=mutable,
                                         rngs={"noise": rng})
            return out, {**g_state, **mut}

        if train and self.cfg.remat:
            # bandwidth-bound workload (roofline_*.json: 82% of HBM peak at
            # 29% MFU): recomputing the G forward in the backward trades
            # cheap FLOPs for activation reads/writes
            fwd = jax.checkpoint(fwd)
        return fwd(params, g_state, x, labels, rng)

    def _labels(self, x):
        return jnp.zeros((x.shape[0], self.cfg.label_nc),
                         jnp.float32).at[:, 0].set(1.0)

    def d_step(self, state: GANTrainState, batch: Dict, rng: jax.Array):
        from de_i2i_gan_tpu.ops.fused import batch_images_to_float
        batch = batch_images_to_float(batch)
        x, y = batch["input"], batch["target"]
        b = x.shape[0]
        fake, _ = self._gen(state.G.params, state.G.state, x,
                            self._labels(x), rng, train=False)
        fake = jax.lax.stop_gradient(fake)

        def loss_fn(d_params):
            # real and fake stacked into ONE forward: exact (the PatchGAN
            # uses instance norm — no cross-batch statistics) and ~4% faster
            # on TPU (larger convs tile the MXU better, half the dispatches)
            duo = jnp.concatenate([jnp.concatenate([x, y], axis=-1),
                                   jnp.concatenate([x, fake], axis=-1)],
                                  axis=0)
            outs = self.D.apply({"params": d_params}, duo, train=True)
            loss = 0.0
            for lg, _ in outs:
                loss = loss + 0.5 * (
                    gan_loss(lg[:b], True, self.gan_kind, True) +
                    gan_loss(lg[b:], False, self.gan_kind, True))
            return loss / len(outs)

        loss, grads = jax.value_and_grad(loss_fn)(state.D.params)
        updates, opt = self.tx_D.update(grads, state.D.opt_state,
                                        state.D.params)
        return state.replace(
            D=NetState(optax.apply_updates(state.D.params, updates), {}, opt),
            step=state.step + 1), {"d_loss": loss}

    def g_step(self, state: GANTrainState, batch: Dict, rng: jax.Array):
        from de_i2i_gan_tpu.ops.fused import batch_images_to_float
        batch = batch_images_to_float(batch)
        x, y = batch["input"], batch["target"]

        b = x.shape[0]

        def loss_fn(g_params):
            fake, g_state = self._gen(g_params, state.G.state, x,
                                      self._labels(x), rng, train=True)
            # fake + real pairs in one D forward (exact, see d_step)
            duo = jnp.concatenate([jnp.concatenate([x, fake], axis=-1),
                                   jnp.concatenate([x, y], axis=-1)],
                                  axis=0)
            outs = self.D.apply({"params": state.D.params}, duo, train=False)
            adv = sum(gan_loss(lg[:b], True, self.gan_kind, False)
                      for lg, _ in outs) / len(outs)
            fm = feature_matching([[f[b:] for f in fs] for _, fs in outs],
                                  [[f[:b] for f in fs] for _, fs in outs])
            rec = l1(fake, y)
            loss = adv + self.lambda_l1 * rec + self.lambda_fm * fm
            return loss, (g_state, {"adv": adv, "l1": rec, "fm": fm})

        (_, (g_state, metrics)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.G.params)
        updates, opt = self.tx_G.update(grads, state.G.opt_state,
                                        state.G.params)
        g_params = optax.apply_updates(state.G.params, updates)
        ema = state.ema_G
        if ema is not None:
            ema = ema_update(ema, g_params, self.tcfg.ema_decay)
        return state.replace(G=NetState(g_params, g_state, opt), ema_G=ema), \
            metrics

    def train_step(self, state, batch, rng):
        """One training iteration with the canonical pix2pix schedule
        (junyanz pix2pix models/pix2pix_model.py optimize_parameters):
        the fake is generated ONCE in train mode; the D update sees it
        detached; the G update reuses the SAME fake against the UPDATED D,
        with the generator gradient pulled back through jax.vjp's saved
        forward. One G forward + one G backward per iteration instead of
        the two-forward alternating variant (~25% faster, identical
        update order). fused_prop=True additionally merges the two
        backwards (simultaneous-update semantics)."""
        if self.fused_prop:
            return self.fused_train_step(state, batch, rng)
        from de_i2i_gan_tpu.ops.fused import batch_images_to_float
        batch = batch_images_to_float(batch)
        x, y = batch["input"], batch["target"]
        b = x.shape[0]

        fake, gen_vjp, g_state = jax.vjp(
            lambda p: self._gen(p, state.G.state, x, self._labels(x), rng,
                                train=True),
            state.G.params, has_aux=True)
        fake_sg = jax.lax.stop_gradient(fake)

        # --- D update on the detached fake ------------------------------
        def d_loss_fn(d_params):
            duo = jnp.concatenate(
                [jnp.concatenate([x, y], axis=-1),
                 jnp.concatenate([x, fake_sg], axis=-1)], axis=0)
            outs = self.D.apply({"params": d_params}, duo, train=True)
            loss = 0.0
            for lg, _ in outs:
                loss = loss + 0.5 * (
                    gan_loss(lg[:b], True, self.gan_kind, True) +
                    gan_loss(lg[b:], False, self.gan_kind, True))
            return loss / len(outs)

        d_loss, d_grads = jax.value_and_grad(d_loss_fn)(state.D.params)
        d_up, d_opt = self.tx_D.update(d_grads, state.D.opt_state,
                                       state.D.params)
        d_params = optax.apply_updates(state.D.params, d_up)

        # --- G update: same fake, UPDATED D, pullback through the saved
        # generator forward --------------------------------------------
        def g_loss_from_fake(fake_):
            duo = jnp.concatenate(
                [jnp.concatenate([x, fake_], axis=-1),
                 jnp.concatenate([x, y], axis=-1)], axis=0)
            outs = self.D.apply({"params": d_params}, duo, train=False)
            adv = sum(gan_loss(lg[:b], True, self.gan_kind, False)
                      for lg, _ in outs) / len(outs)
            fm = feature_matching([[f[b:] for f in fs] for _, fs in outs],
                                  [[f[:b] for f in fs] for _, fs in outs])
            rec = l1(fake_, y)
            loss = adv + self.lambda_l1 * rec + self.lambda_fm * fm
            return loss, {"adv": adv, "l1": rec, "fm": fm}

        (_, gm), fake_ct = jax.value_and_grad(
            g_loss_from_fake, has_aux=True)(fake)
        (g_grads,) = gen_vjp(fake_ct)
        g_up, g_opt = self.tx_G.update(g_grads, state.G.opt_state,
                                      state.G.params)
        g_params = optax.apply_updates(state.G.params, g_up)
        ema = state.ema_G
        if ema is not None:
            ema = ema_update(ema, g_params, self.tcfg.ema_decay)
        return state.replace(
            G=NetState(g_params, g_state, g_opt),
            D=NetState(d_params, state.D.state, d_opt),
            ema_G=ema, step=state.step + 1), {"d_loss": d_loss, **gm}

    def fused_train_step(self, state, batch, rng):
        """FusedProp (arxiv 2004.03335): ONE G forward and ONE joint
        backward produce both parameter updates. The D-loss term sees
        stop_gradient(fake); the G-loss term sees stop_gradient(d_params);
        the primal D forward over the identical pairs is shared by XLA CSE.
        Semantics = simultaneous updates (G's gradient uses the PRE-update
        D), a documented deviation from the reference's alternating
        schedule — opt in via fused_prop=True / --fused_prop.
        """
        from de_i2i_gan_tpu.ops.fused import batch_images_to_float
        batch = batch_images_to_float(batch)
        x, y = batch["input"], batch["target"]
        b = x.shape[0]

        def joint_loss(params):
            g_params, d_params = params
            fake, g_state = self._gen(g_params, state.G.state, x,
                                      self._labels(x), rng, train=True)
            fake_sg = jax.lax.stop_gradient(fake)
            d_sg = jax.tree_util.tree_map(jax.lax.stop_gradient, d_params)

            # --- D term: live d_params, detached fake -------------------
            duo_d = jnp.concatenate(
                [jnp.concatenate([x, y], axis=-1),
                 jnp.concatenate([x, fake_sg], axis=-1)], axis=0)
            outs_d = self.D.apply({"params": d_params}, duo_d, train=True)
            loss_d = 0.0
            for lg, _ in outs_d:
                loss_d = loss_d + 0.5 * (
                    gan_loss(lg[:b], True, self.gan_kind, True) +
                    gan_loss(lg[b:], False, self.gan_kind, True))
            loss_d = loss_d / len(outs_d)

            # --- G term: frozen d_params, live fake. Same pair ordering
            # and train flag as the D term so the primal forwards are
            # identical expressions XLA can CSE into one D pass. ---------
            duo_g = jnp.concatenate(
                [jnp.concatenate([x, y], axis=-1),
                 jnp.concatenate([x, fake], axis=-1)], axis=0)
            outs_g = self.D.apply({"params": d_sg}, duo_g, train=True)
            adv = sum(gan_loss(lg[b:], True, self.gan_kind, False)
                      for lg, _ in outs_g) / len(outs_g)
            fm = feature_matching([[f[:b] for f in fs] for _, fs in outs_g],
                                  [[f[b:] for f in fs] for _, fs in outs_g])
            rec = l1(fake, y)
            loss_g = adv + self.lambda_l1 * rec + self.lambda_fm * fm
            metrics = {"d_loss": loss_d, "adv": adv, "l1": rec, "fm": fm}
            return loss_d + loss_g, (g_state, metrics)

        (_, (g_state, metrics)), (g_grads, d_grads) = jax.value_and_grad(
            joint_loss, has_aux=True)((state.G.params, state.D.params))
        d_up, d_opt = self.tx_D.update(d_grads, state.D.opt_state,
                                       state.D.params)
        d_params = optax.apply_updates(state.D.params, d_up)
        g_up, g_opt = self.tx_G.update(g_grads, state.G.opt_state,
                                       state.G.params)
        g_params = optax.apply_updates(state.G.params, g_up)
        ema = state.ema_G
        if ema is not None:
            ema = ema_update(ema, g_params, self.tcfg.ema_decay)
        return state.replace(
            G=NetState(g_params, g_state, g_opt),
            D=NetState(d_params, state.D.state, d_opt),
            ema_G=ema, step=state.step + 1), metrics

    def super_step(self, state, batches, rng):
        """Scan train_step over a stacked (iters_per_launch, B, ...) batch so
        one device launch advances several iterations (same pattern as
        DefectGanSteps.super_step — host dispatch overhead amortized)."""
        def body(carry, sub):
            st, key = carry
            key, k = jax.random.split(key)
            st, m = self.train_step(st, sub, k)
            return (st, key), m

        (state, rng), ms = jax.lax.scan(body, (state, rng), batches)
        return state, {k: v.mean() for k, v in ms.items()}

    def generate(self, state: GANTrainState, x: jax.Array,
                 use_ema: bool = True):
        """Folder-inference forward: EMA generator when available."""
        from de_i2i_gan_tpu.ops.fused import images_to_float
        x = images_to_float(x)  # u8 loader batches normalize on device
        params = state.ema_G if (use_ema and state.ema_G is not None) \
            else state.G.params
        out, _ = self._gen(params, state.G.state, x, self._labels(x),
                           jax.random.PRNGKey(0), train=False)
        return out

    @functools.cached_property
    def jit_train_step(self):
        return jax.jit(self.train_step, donate_argnums=0)

    @functools.cached_property
    def jit_super_step(self):
        return jax.jit(self.super_step, donate_argnums=0)

    @functools.cached_property
    def jit_generate(self):
        return jax.jit(self.generate, static_argnames=("use_ema",))
