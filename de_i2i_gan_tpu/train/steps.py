"""Jitted DefectGAN training steps.

The reference's loss graph lives in
/root/reference/defectGAN/models/defectgan_model.py:
  * generator loss    (:173-249)  double cycle normal->defect->normal and
    defect->normal->defect, BCE GAN + classifier + L1 reconstruction +
    spatial-distribution cycle (sd_cyc) + spatial concentration (sd_con)
  * discriminator loss (:251-292) 4-term BCE real/fake x defect/normal + cls
    on reals, DiffAugment on D inputs
and the alternating schedule in trainers/defectgan_trainer.py:107-109 (one D
update per iteration, one G update every ``num_critics``).

TPU-first design:
  * each of d_step / g_step compiles to a single XLA program; ``super_step``
    runs ``num_critics`` D updates via lax.scan followed by one G update — the
    whole reference inner loop is one device launch per num_critics iterations.
  * the four discriminator forwards of the D step are one batched (4B) call
    (D has no batch norm, so per-sample semantics are identical,
    discriminator.py:60-79), likewise the two fake forwards of the G step.
  * mode flags (netG.train()/netD.eval(), defectgan_model.py:83-90) become
    static ``train=`` arguments: eval-mode forwards use BatchNorm running
    averages and frozen spectral-norm u vectors.
  * gradients never flow into the EMA/statistics state; the state is threaded
    functionally through the loss closure as an auxiliary output.
"""
from __future__ import annotations

import functools
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from de_i2i_gan_tpu.config import DefectGanConfig, TrainConfig
from de_i2i_gan_tpu.losses.common import bce_logits, cal_loss, l1
from de_i2i_gan_tpu.models.discriminator import DefectGanDiscriminator
from de_i2i_gan_tpu.models.extractor import StyleExtractor
from de_i2i_gan_tpu.models.generator import DefectGanGenerator
from de_i2i_gan_tpu.train.optim import ema_update, make_optimizer
from de_i2i_gan_tpu.train.state import GANTrainState, NetState
from de_i2i_gan_tpu.utils.diffaug import diff_augment
from de_i2i_gan_tpu.utils.labels import normal_labels

Batch = Dict[str, jax.Array]


def _split_state(mut: dict, old: dict) -> dict:
    return {**old, **mut}


class DefectGanSteps:
    """Factory for the jitted step functions of one DefectGAN experiment."""

    def __init__(self, cfg: DefectGanConfig, tcfg: TrainConfig,
                 iters_per_epoch: int = 1000, num_epochs: int = 100):
        self.cfg = cfg
        self.tcfg = tcfg
        self.iters_per_epoch = iters_per_epoch
        self.num_epochs = num_epochs
        self.G = DefectGanGenerator(cfg)
        self.D = DefectGanDiscriminator(cfg)
        self.E = StyleExtractor(cfg) if cfg.style_norm_block_type == "adain" else None

        self.tx_D = make_optimizer(tcfg, tcfg.lr_d, iters_per_epoch, num_epochs)
        self.tx_G = make_optimizer(tcfg, tcfg.lr_g, iters_per_epoch, num_epochs,
                                   update_every=tcfg.num_critics)
        self.tx_E = (make_optimizer(tcfg, tcfg.lr_g, iters_per_epoch,
                                    num_epochs, update_every=tcfg.num_critics)
                     if self.E is not None else None)
        # loss weights [clf_d, clf_g, rec, sd_cyc, sd_con]
        assert len(tcfg.loss_weight) == 5, "loss_weight must have 5 entries"
        (self.w_clf_d, self.w_clf_g, self.w_rec, self.w_sd_cyc,
         self.w_sd_con) = tcfg.loss_weight

    # ------------------------------------------------------------------ init
    def init_state(self, rng: jax.Array) -> GANTrainState:
        cfg = self.cfg
        b = 2
        img = jnp.zeros((b, cfg.image_size, cfg.image_size, cfg.input_nc),
                        jnp.float32)
        labels = jnp.zeros((b, cfg.label_nc), jnp.float32)
        feat = self._dummy_feat(b)
        k_g, k_d, k_e, k_n = jax.random.split(rng, 4)
        rngs = {"params": k_g, "noise": k_n, "latent": k_n}

        g_vars = self.G.init(rngs, img, labels, feat, train=True)
        g_params = g_vars["params"]
        g_state = {k: v for k, v in g_vars.items() if k != "params"}

        d_vars = self.D.init({"params": k_d}, img, train=True)
        d_params = d_vars["params"]
        d_state = {k: v for k, v in d_vars.items() if k != "params"}

        # BaseNetwork.init_weights dispatch (base_network.py:27-53): the
        # layers are built with the normal(0.02) default; other --init_type
        # values re-draw the Conv/Linear kernels post-construction, exactly
        # like the reference's module-walk.
        if cfg.init_type != "normal" or cfg.init_variance != 0.02:
            from de_i2i_gan_tpu.nn.layers import reinit_params
            g_params = reinit_params(k_g, g_params, cfg.init_type,
                                     cfg.init_variance)
            d_params = reinit_params(k_d, d_params, cfg.init_type,
                                     cfg.init_variance)

        e_net = None
        if self.E is not None:
            e_vars = self.E.init({"params": k_e, "latent": k_n}, img, labels,
                                 train=True)
            e_params = e_vars["params"]
            e_state = {k: v for k, v in e_vars.items() if k != "params"}
            e_net = NetState(e_params, e_state, self.tx_E.init(e_params))

        ema = (jax.tree_util.tree_map(jnp.copy, g_params)
               if self.tcfg.ema_decay > 0 else None)
        return GANTrainState(
            G=NetState(g_params, g_state, self.tx_G.init(g_params)),
            D=NetState(d_params, d_state, self.tx_D.init(d_params)),
            E=e_net, ema_G=ema, step=jnp.zeros((), jnp.int32))

    def _dummy_feat(self, b: int):
        cfg = self.cfg
        if cfg.style_norm_block_type == "sean":
            return jnp.zeros((b, cfg.num_embeds, cfg.embed_nc), jnp.float32)
        if cfg.style_norm_block_type == "adain":
            return jnp.zeros((b, cfg.hidden_nc), jnp.float32)
        return None

    # ------------------------------------------------------------- internals
    def _g_apply(self, params, state, x, labels, feat, *, train, rng,
                 track_stats=False, inference_stats=False, distill=False,
                 bn_groups=1):
        variables = {"params": params, **state}
        mutable = []
        if train:
            mutable += ["batch_stats", "spectral"]
        if track_stats:
            mutable += ["sean_stats"]
        if distill:
            mutable += ["distill_loss"]
        kn, kl = jax.random.split(rng)
        out, mut = self.G.apply(
            variables, x, labels, feat, train=train, track_stats=track_stats,
            inference_stats=inference_stats, distill=distill,
            bn_groups=bn_groups,
            mutable=mutable, rngs={"noise": kn, "latent": kl})
        distill_vals = mut.pop("distill_loss", None) if distill else None
        return out, _split_state(mut, state), distill_vals

    def _d_apply(self, params, state, x, *, train):
        variables = {"params": params, **state}
        mutable = ["spectral"] if train else []
        (src, cls), mut = self.D.apply(variables, x, train=train,
                                       mutable=mutable)
        return (src, cls), _split_state(mut, state)

    def _style_feats(self, batch: Batch, e_params, e_state, rng,
                     stop_e: bool) -> Tuple[Any, Any]:
        """(nm_feat, df_feat) per style type (defectgan_model.py:413-428)."""
        cfg = self.cfg
        if cfg.style_norm_block_type == "spade":
            return None, None
        if cfg.style_norm_block_type == "sean":
            return batch.get("nm_embeds"), batch.get("df_embeds")
        # adain: style codes extracted from the real images
        nm_l = normal_labels(batch["df_labels"])
        k1, k2 = jax.random.split(rng)
        nm_feat = self.E.apply({"params": e_params, **e_state}, batch["bg"],
                               nm_l, rngs={"latent": k1})
        df_feat = self.E.apply({"params": e_params, **e_state}, batch["df"],
                               batch["df_labels"], rngs={"latent": k2})
        if stop_e:
            nm_feat = jax.lax.stop_gradient(nm_feat)
            df_feat = jax.lax.stop_gradient(df_feat)
        return nm_feat, df_feat

    # ---------------------------------------------------------------- D step
    def d_loss_fn(self, d_params, state: GANTrainState, batch: Batch,
                  rng: jax.Array):
        cfg, tcfg = self.cfg, self.tcfg
        bg, df, df_labels = batch["bg"], batch["df"], batch["df_labels"]
        nm_labels = normal_labels(df_labels)
        k_feat, k_g1, k_g2, k_aug = jax.random.split(rng, 4)
        e_params = state.E.params if state.E is not None else None
        e_state = state.E.state if state.E is not None else None
        nm_feat, df_feat = self._style_feats(batch, e_params, e_state, k_feat,
                                             stop_e=True)

        # fakes from the frozen generator (defectgan_model.py:256-260)
        if cfg.fused_g_forward:
            feat = None if df_feat is None else jnp.concatenate(
                [df_feat, nm_feat], axis=0)
            (fakes, _), _, _ = self._g_apply(
                state.G.params, state.G.state,
                jnp.concatenate([bg, df], axis=0),
                jnp.concatenate([df_labels, nm_labels], axis=0),
                feat, train=False, rng=k_g1)
            b0 = bg.shape[0]
            fake_df, fake_nm = fakes[:b0], fakes[b0:]
        else:
            (fake_df, _), _, _ = self._g_apply(
                state.G.params, state.G.state, bg, df_labels, df_feat,
                train=False, rng=k_g1)
            (fake_nm, _), _, _ = self._g_apply(
                state.G.params, state.G.state, df, nm_labels, nm_feat,
                train=False, rng=k_g2)
        fake_df = jax.lax.stop_gradient(fake_df)
        fake_nm = jax.lax.stop_gradient(fake_nm)

        # one batched D forward over [fake_df | fake_nm | real_df | real_bg]
        # (4 separate calls in the reference, defectgan_model.py:272-275; D is
        # norm-free so batching is exact)
        quad = jnp.concatenate([fake_df, fake_nm, df, bg], axis=0)
        quad = diff_augment(k_aug, quad, tcfg.diff_aug)
        (src, cls), d_state = self._d_apply(d_params, state.D.state, quad,
                                            train=True)
        b = bg.shape[0]
        fd_src, fn_src, rd_src, rn_src = (src[:b], src[b:2 * b],
                                          src[2 * b:3 * b], src[3 * b:])
        rd_cls, rn_cls = cls[2 * b:3 * b], cls[3 * b:]

        gan_loss = (bce_logits(fd_src, jnp.zeros_like(fd_src)) +
                    bce_logits(fn_src, jnp.zeros_like(fn_src)) +
                    bce_logits(rd_src, jnp.ones_like(rd_src)) +
                    bce_logits(rn_src, jnp.ones_like(rn_src))) / 4.0
        clf_loss = (cal_loss(rd_cls, df_labels, tcfg.clf_loss_type) +
                    cal_loss(rn_cls, nm_labels, tcfg.clf_loss_type)) / 2.0
        d_loss = gan_loss + clf_loss * self.w_clf_d
        metrics = {"gan_D": gan_loss, "clf_D": clf_loss}
        return d_loss, (d_state, metrics)

    def d_step(self, state: GANTrainState, batch: Batch, rng: jax.Array):
        from de_i2i_gan_tpu.ops.fused import batch_images_to_float
        batch = batch_images_to_float(batch)
        grad_fn = jax.value_and_grad(self.d_loss_fn, has_aux=True)
        (_, (d_state, metrics)), grads = grad_fn(state.D.params, state, batch,
                                                 rng)
        updates, opt_state = self.tx_D.update(grads, state.D.opt_state,
                                              state.D.params)
        d_params = optax.apply_updates(state.D.params, updates)
        return state.replace(
            D=NetState(d_params, d_state, opt_state),
            step=state.step + 1), metrics

    # ---------------------------------------------------------------- G step
    def g_loss_fn(self, ge_params, state: GANTrainState, batch: Batch,
                  rng: jax.Array):
        cfg, tcfg = self.cfg, self.tcfg
        g_params, e_params = ge_params
        bg, df, df_labels = batch["bg"], batch["df"], batch["df_labels"]
        nm_labels = normal_labels(df_labels)
        k_feat, k1, k2, k3, k4, k_aug = jax.random.split(rng, 6)
        e_state = state.E.state if state.E is not None else None
        nm_feat, df_feat = self._style_feats(batch, e_params, e_state, k_feat,
                                             stop_e=False)

        track = (cfg.style_norm_block_type == "sean" and cfg.use_running_stats)
        distill = (cfg.style_norm_block_type == "sean" and cfg.style_distill)
        g_state = state.G.state
        distill_acc = []

        def _g_fwd_pure(params, g_state, x, labels, feat, k):
            # fused 2B calls scope BN stats per direction (bn_groups=2), so
            # fusing is a pure scheduling choice — numerics proven identical
            # to the 4-call schedule by tests/test_fused_g_equivalence.py
            return self._g_apply(params, g_state, x, labels, feat,
                                 train=True, rng=k, track_stats=track,
                                 distill=distill,
                                 bn_groups=2 if cfg.fused_g_forward else 1)

        if cfg.remat:
            _g_fwd_pure = jax.checkpoint(_g_fwd_pure)

        def gfwd(x, labels, feat, k, g_state):
            (out, prob), g_state, dvals = _g_fwd_pure(g_params, g_state, x,
                                                      labels, feat, k)
            if dvals is not None:
                distill_acc.append(dvals)
            return out, prob, g_state

        if cfg.fused_g_forward:
            # both directions of each hop in one 2B call (TPU: larger tiles,
            # half the launches). BN statistics stay per-direction via
            # bn_groups=2 in _g_fwd_pure, so this path is numerically
            # identical to the 4-call schedule (same losses and gradients;
            # only the noise-RNG stream and the running-average update
            # ORDER differ — tests/test_fused_g_equivalence.py)
            def cat(a, b):
                return None if a is None else jnp.concatenate([a, b], axis=0)

            b = bg.shape[0]
            h1_out, h1_p, g_state = gfwd(
                jnp.concatenate([bg, df], axis=0),
                jnp.concatenate([df_labels, nm_labels], axis=0),
                cat(df_feat, nm_feat), k1, g_state)
            fake_df, fake_nm = h1_out[:b], h1_out[b:]
            p_df, p_nm = h1_p[:b], h1_p[b:]
            h2_out, h2_p, g_state = gfwd(
                h1_out, jnp.concatenate([nm_labels, df_labels], axis=0),
                cat(nm_feat, df_feat), k2, g_state)
            rec_nm, rec_df = h2_out[:b], h2_out[b:]
            p_rec_df, p_rec_nm = h2_p[:b], h2_p[b:]
        else:
            # double cycle, reference order (defectgan_model.py:185-190)
            fake_df, p_df, g_state = gfwd(bg, df_labels, df_feat, k1, g_state)
            rec_nm, p_rec_df, g_state = gfwd(fake_df, nm_labels, nm_feat, k2,
                                             g_state)
            fake_nm, p_nm, g_state = gfwd(df, nm_labels, nm_feat, k3, g_state)
            rec_df, p_rec_nm, g_state = gfwd(fake_nm, df_labels, df_feat, k4,
                                             g_state)

        # frozen D on augmented fakes (one batched 2B call)
        duo = jnp.concatenate([fake_df, fake_nm], axis=0)
        duo = diff_augment(k_aug, duo, tcfg.diff_aug)
        (src, cls), _ = self._d_apply(state.D.params, state.D.state, duo,
                                      train=False)
        b = bg.shape[0]
        fd_src, fn_src = src[:b], src[b:]
        fd_cls, fn_cls = cls[:b], cls[b:]

        gan_loss = (bce_logits(fd_src, jnp.ones_like(fd_src)) +
                    bce_logits(fn_src, jnp.ones_like(fn_src))) / 2.0
        clf_loss = (cal_loss(fd_cls, df_labels, tcfg.clf_loss_type) +
                    cal_loss(fn_cls, nm_labels, tcfg.clf_loss_type)) / 2.0
        rec_loss = (l1(rec_df, df) + l1(rec_nm, bg)) / 2.0

        if cfg.cycle_gan:
            sd_cyc = jnp.zeros(())
            sd_con = jnp.zeros(())
        else:
            sd_cyc = (l1(p_df, p_rec_df) + l1(p_nm, p_rec_nm)) / 2.0
            zero = jnp.zeros_like(p_df)
            sd_con = (l1(p_df, zero) + l1(p_nm, zero) +
                      l1(p_rec_df, zero) + l1(p_rec_nm, zero)) / 4.0

        g_loss = (gan_loss + clf_loss * self.w_clf_g + rec_loss * self.w_rec +
                  sd_cyc * self.w_sd_cyc + sd_con * self.w_sd_con)

        metrics = {"gan_G": gan_loss, "clf_G": clf_loss, "rec": rec_loss,
                   "sd_cyc": sd_cyc, "sd_con": sd_con}
        if distill and distill_acc:
            # each sown value was individually backpropped in the reference
            # (normalization.py:186-194): total = sum(0.1*latent + embed)
            lat = [v for d in distill_acc for v in jax.tree_util.tree_leaves(
                d.get("latent", ()))]
            emb = [v for d in distill_acc for v in jax.tree_util.tree_leaves(
                d.get("embed", ()))]
            lat_sum = jnp.sum(jnp.stack(lat)) if lat else jnp.zeros(())
            emb_sum = jnp.sum(jnp.stack(emb)) if emb else jnp.zeros(())
            g_loss = g_loss + 0.1 * lat_sum + emb_sum
            metrics["distill_latent"] = (jnp.mean(jnp.stack(lat)) if lat
                                         else jnp.zeros(()))
            metrics["distill_embed"] = (jnp.mean(jnp.stack(emb)) if emb
                                        else jnp.zeros(()))
        return g_loss, (g_state, metrics)

    def g_step(self, state: GANTrainState, batch: Batch, rng: jax.Array):
        from de_i2i_gan_tpu.ops.fused import batch_images_to_float
        batch = batch_images_to_float(batch)
        e_params = state.E.params if state.E is not None else None
        grad_fn = jax.value_and_grad(self.g_loss_fn, has_aux=True)
        (_, (g_state, metrics)), grads = grad_fn(
            (state.G.params, e_params), state, batch, rng)
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

        ema = state.ema_G
        if ema is not None:
            ema = ema_update(ema, g_params, self.tcfg.ema_decay)

        return state.replace(G=NetState(g_params, g_state, g_opt), E=new_e,
                             ema_G=ema), metrics

    # ------------------------------------------------------------ super step
    def super_step(self, state: GANTrainState, batches: Batch, rng: jax.Array):
        """num_critics D updates (scan) + one G update on the last sub-batch.

        ``batches`` leaves have a leading (num_critics,) axis. Matches the
        reference schedule where the G step re-uses the iteration's batch
        (defectgan_trainer.py:96-109).
        """
        def body(carry, sub_batch):
            st, key = carry
            key, k = jax.random.split(key)
            st, m = self.d_step(st, sub_batch, k)
            return (st, key), m

        (state, rng), d_metrics = jax.lax.scan(body, (state, rng), batches)
        last = jax.tree_util.tree_map(lambda x: x[-1], batches)
        rng, k = jax.random.split(rng)
        state, g_metrics = self.g_step(state, last, k)
        metrics = {k: v.mean() for k, v in d_metrics.items()}
        metrics.update(g_metrics)
        return state, metrics

    # ------------------------------------------------------------- inference
    def generate(self, state: GANTrainState, data: jax.Array,
                 labels: jax.Array, style_feat=None, rng: Optional[jax.Array] = None,
                 use_ema: bool = False, inference_stats: bool = False):
        """Eval-mode generation (defectgan_model.py:302-314)."""
        params = state.ema_G if (use_ema and state.ema_G is not None) else \
            state.G.params
        if rng is None:
            rng = jax.random.PRNGKey(0)
        if (self.cfg.style_norm_block_type == "adain" and style_feat is None
                and state.E is not None):
            style_feat = self.E.apply(
                {"params": state.E.params, **state.E.state}, data, labels,
                rngs={"latent": rng})
        (out, prob), _, _ = self._g_apply(
            params, state.G.state, data, labels, style_feat, train=False,
            rng=rng, inference_stats=inference_stats)
        return out, prob

    # --------------------------------------------------------------- jitting
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
    def jit_generate(self):
        return jax.jit(self.generate,
                       static_argnames=("use_ema", "inference_stats"))
