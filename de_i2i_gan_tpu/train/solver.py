"""StarGAN v2 solver: configs, losses and jitted train steps.

Mirrors /root/reference/stargan-v2/core/solver.py:
  * per-net Adam (betas 0/0.99, weight decay 1e-4; f_lr for the mapping
    network; solver.py:48-56, main.py defaults)
  * D loss = BCE(real->1) + BCE(fake->0) + lambda_reg * R1 (solver.py:467-491)
    — R1 is jax.grad-of-grad here, no create_graph bookkeeping
  * G loss = adv + lambda_sty * style-recon - lambda_ds * diversity +
    lambda_cyc * cycle (solver.py:494-546)
  * adain mode runs a latent-guided and a reference-guided pass per iteration
    (solver.py:266-298); sean mode runs reference-only
  * EMA of G (and mapping/style encoder for adain) with beta 0.999
    (solver.py:549-563); SEAN running stats finalize each iteration
  * lambda_ds decays linearly to 0 over ds_iter iterations (solver.py:311-313)
    — computed from the step counter, not mutated state

Style codes (core/utils.py:485-516 get_style_code):
  adain + latent  -> mapping_network(z, y)
  adain + ref     -> style_encoder(x_ref, y)
  sean  + ref     -> frozen-ViT CLS embeddings of the reference images,
                     supplied in the batch (precomputed or via
                     models.vit.FeatureExtractor — keeps the frozen net out of
                     the differentiated graph entirely)
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from de_i2i_gan_tpu.losses.common import bce_logits, l1
from de_i2i_gan_tpu.models.starganv2 import (
    Generator, MappingNetwork, StarGANv2Discriminator, StyleEncoder,
    sean_v2_update_stats)
from de_i2i_gan_tpu.train.optim import ema_update
from de_i2i_gan_tpu.train.state import NetState
from de_i2i_gan_tpu.utils.diffaug import diff_augment

import flax.struct


@dataclasses.dataclass(frozen=True)
class StarGANv2Config:
    """main.py:150-267 defaults."""

    img_size: int = 256
    num_domains: int = 2
    latent_dim: int = 16
    hidden_nc: int = 256
    style_dim: int = 64
    embed_nc: int = 768
    norm_type: str = "adain"  # adain | sean
    w_hpf: float = 1.0
    max_conv_dim: int = 512
    lambda_reg: float = 1.0
    lambda_cyc: float = 1.0
    lambda_sty: float = 1.0
    lambda_ds: float = 1.0
    lambda_rec: float = 10.0  # MAE pretrain reconstruction (main.py:175)
    ds_iter: int = 100_000
    total_iters: int = 100_000
    batch_size: int = 8
    lr: float = 1e-4
    f_lr: float = 1e-6
    beta1: float = 0.0
    beta2: float = 0.99
    weight_decay: float = 1e-4
    num_embeds: int = 5
    diff_aug: str = ""
    ema_beta: float = 0.999
    # FusedProp (arxiv 2004.03335): fuse each D+G update pair into one
    # joint backward sharing the fake-generation forward (simultaneous-
    # update semantics — G's gradient sees the pre-update D). Opt-in.
    fused_prop: bool = False
    compute_dtype: str = "float32"
    # Strict-by-default guard: training configurations that silently degrade
    # a loss term (sean without a frozen ViT -> lambda_sty inactive; w_hpf>0
    # without FAN -> cycle pass reuses source masks) are ERRORS unless this
    # is set (CLI: --allow_degraded_losses). Reference semantics always
    # compute both terms (solver.py:515, :529).
    allow_degraded_losses: bool = False

    @property
    def dtype(self):
        return jnp.dtype(self.compute_dtype)


@flax.struct.dataclass
class SolverState:
    G: NetState
    D: NetState
    M: Optional[NetState]  # mapping network (adain)
    S: Optional[NetState]  # style encoder (adain)
    ema_G: Any
    ema_M: Any
    ema_S: Any
    ema_sean_stats: Any
    step: jnp.ndarray


class StarGANv2Solver:
    def __init__(self, cfg: StarGANv2Config):
        self.cfg = cfg
        adain = cfg.norm_type == "adain"
        self.G = Generator(cfg.img_size, cfg.style_dim, cfg.max_conv_dim,
                           cfg.w_hpf, cfg.norm_type, cfg.embed_nc,
                           cfg.num_domains, cfg.hidden_nc, dtype=cfg.dtype)
        self.D = StarGANv2Discriminator(cfg.img_size, cfg.num_domains,
                                        cfg.max_conv_dim, dtype=cfg.dtype)
        self.M = MappingNetwork(cfg.latent_dim, cfg.style_dim,
                                cfg.num_domains, dtype=cfg.dtype) if adain \
            else None
        self.S = StyleEncoder(cfg.img_size, cfg.style_dim, cfg.num_domains,
                              cfg.max_conv_dim, dtype=cfg.dtype) if adain \
            else None

        def adamw(lr):
            # torch.optim.Adam(weight_decay=1e-4) (solver.py:48-56) couples
            # the L2 term into the gradient BEFORE adaptive scaling — chain
            # add_decayed_weights ahead of the adam transform rather than
            # using optax.adamw's decoupled decay
            return optax.chain(
                optax.add_decayed_weights(cfg.weight_decay),
                optax.scale_by_adam(b1=cfg.beta1, b2=cfg.beta2),
                optax.scale(-lr))

        self.tx_G = adamw(cfg.lr)
        self.tx_D = adamw(cfg.lr)
        self.tx_M = adamw(cfg.f_lr) if adain else None
        self.tx_S = adamw(cfg.lr) if adain else None

        # frozen nets optionally embedded into the jitted G loss
        # (solver.py:515 s_pred = get_style_code(..., x_fake);
        #  solver.py:529 masks = nets.fan.get_heatmap(x_fake))
        self._vit = None
        self._vit_vars = None
        self._fan = None
        self._fan_vars = None
        self._warned = set()

    def set_frozen_nets(self, vit_variables=None, fan_variables=None,
                        vit_model_size: str = "base", vit_encoder=None):
        """Attach the frozen ViT feature extractor and/or FAN heatmapper so
        the jitted G loss matches the reference graph exactly: sean-mode
        style reconstruction embeds x_fake through the ViT (gradients flow
        through x_fake, not the frozen params), and the cycle pass recomputes
        hpf masks from x_fake (under stop_gradient — the reference's
        get_heatmap is @torch.no_grad(), wing.py:248)."""
        if vit_variables is not None:
            if vit_encoder is None:
                from de_i2i_gan_tpu.models.vit import ViTEncoder
                vit_encoder = ViTEncoder(model_size=vit_model_size,
                                         dtype=self.cfg.dtype)
            self._vit = vit_encoder
            self._vit_vars = vit_variables
        if fan_variables is not None:
            from de_i2i_gan_tpu.models.wing import FAN
            self._fan = FAN()
            self._fan_vars = fan_variables
        # re-jit with the new loss graph
        for prop in ("jit_train_step", "jit_pretrain_step", "jit_generate"):
            self.__dict__.pop(prop, None)

    def _warn_once(self, key: str, msg: str):
        if key not in self._warned:
            self._warned.add(key)
            import logging
            logging.getLogger(__name__).warning(msg)

    def _embed_fake(self, x_fake, vit_vars=None):
        """Frozen-ViT CLS embedding of x_fake, (N, 1, embed_nc).

        ``vit_vars`` lets jitted callers pass the frozen parameters as a
        REAL argument (see inject_frozen): a closed-over 86M-param pytree
        gets inlined as HLO constants — 688 MB of StableHLO measured at
        256^2 (vs 2.6 MB injected), which the dev tunnel's remote-compile
        endpoint rejects outright (HTTP 413)."""
        params = jax.lax.stop_gradient(
            vit_vars if vit_vars is not None else self._vit_vars)
        return self._vit.apply(params, x_fake)[:, 0, :][:, None, :]

    def _heatmaps_fake(self, x_fake, fan_vars=None):
        """FAN get_heatmap(x_fake) in-graph (wing.py:248-261), no grads."""
        from de_i2i_gan_tpu.models.wing import preprocess_heatmaps
        x = jax.lax.stop_gradient(x_fake.astype(jnp.float32))
        n = x.shape[0]
        if x.shape[1] != 256:
            x = jax.image.resize(x, (n, 256, 256, 3), "bilinear")
        out, _ = self.net_fan_apply(x * 0.5 + 0.5, fan_vars)
        hm = out[..., :-1]
        hm = jax.image.resize(hm, (n, 256, 256, hm.shape[-1]), "bilinear")
        m1, m2 = preprocess_heatmaps(hm)
        return [jax.lax.stop_gradient(m1), jax.lax.stop_gradient(m2)]

    def net_fan_apply(self, x01, fan_vars=None):
        return self._fan.apply(
            fan_vars if fan_vars is not None else self._fan_vars, x01)

    def frozen_args(self):
        """Frozen-net variables as a dict of extra jit arguments, or None.
        DP callers pass this to make_parallel_step(frozen=...) so the
        params are replicated over the mesh rather than batch-sharded."""
        out = {}
        if self._vit_vars is not None:
            out["_frozen_vit"] = self._vit_vars
        if self._fan_vars is not None:
            out["_frozen_fan"] = self._fan_vars
        return out or None

    def inject_frozen(self, batch):
        """Return ``batch`` with the frozen-net variables added as REAL jit
        arguments (``_frozen_vit`` / ``_frozen_fan``). Every jitted caller
        of train_step/pretrain_step must route batches through this (the
        solver's own jit_* wrappers do) — otherwise the frozen params are
        baked into the program as constants (688 MB StableHLO, measured)."""
        if self._vit_vars is None and self._fan_vars is None:
            return batch
        out = dict(batch)
        if self._vit_vars is not None:
            out["_frozen_vit"] = self._vit_vars
        if self._fan_vars is not None:
            out["_frozen_fan"] = self._fan_vars
        return out

    # ------------------------------------------------------------------ init
    def init_state(self, rng: jax.Array) -> SolverState:
        cfg = self.cfg
        b = 2
        img = jnp.zeros((b, cfg.img_size, cfg.img_size, 3), jnp.float32)
        y = jnp.zeros((b,), jnp.int32)
        k_g, k_d, k_m, k_s = jax.random.split(rng, 4)
        s = self._dummy_style(b)

        g_vars = self.G.init({"params": k_g}, img, s, labels=y)
        g_state = {k: v for k, v in g_vars.items() if k != "params"}
        d_vars = self.D.init({"params": k_d}, img, y)

        m_net = s_net = None
        ema_m = ema_s = None
        if self.M is not None:
            z = jnp.zeros((b, cfg.latent_dim), jnp.float32)
            m_vars = self.M.init({"params": k_m}, z, y)
            m_net = NetState(m_vars["params"], {},
                             self.tx_M.init(m_vars["params"]))
            ema_m = jax.tree_util.tree_map(jnp.copy, m_vars["params"])
            s_vars = self.S.init({"params": k_s}, img, y)
            s_net = NetState(s_vars["params"], {},
                             self.tx_S.init(s_vars["params"]))
            ema_s = jax.tree_util.tree_map(jnp.copy, s_vars["params"])

        ema_sean = (jax.tree_util.tree_map(jnp.copy,
                                           g_state.get("sean_stats"))
                    if "sean_stats" in g_state else None)
        return SolverState(
            G=NetState(g_vars["params"], g_state,
                       self.tx_G.init(g_vars["params"])),
            D=NetState(d_vars["params"], {}, self.tx_D.init(d_vars["params"])),
            M=m_net, S=s_net,
            ema_G=jax.tree_util.tree_map(jnp.copy, g_vars["params"]),
            ema_M=ema_m, ema_S=ema_s, ema_sean_stats=ema_sean,
            step=jnp.zeros((), jnp.int32))

    def _dummy_style(self, b: int):
        cfg = self.cfg
        if cfg.norm_type == "adain":
            return jnp.zeros((b, cfg.style_dim), jnp.float32)
        return jnp.zeros((b, cfg.num_embeds, cfg.embed_nc), jnp.float32)

    # --------------------------------------------------------------- helpers
    def _gen(self, g_params, g_state, x, s, y, masks=None, *,
             track_stats=False, **kw):
        variables = {"params": g_params, **g_state}
        mutable = ["sean_stats"] if track_stats else []
        out, mut = self.G.apply(variables, x, s, masks=masks, labels=y,
                                track_stats=track_stats, mutable=mutable, **kw)
        return out, {**g_state, **mut}

    def _style(self, state: SolverState, batch, y_trg, *, which: str,
               latent: bool):
        """get_style_code (utils.py:485-516)."""
        if self.cfg.norm_type == "adain":
            if latent:
                return self.M.apply({"params": state.M.params},
                                    batch[f"z_{which}"], y_trg)
            return self.S.apply({"params": state.S.params},
                                batch[f"x_{which}"], y_trg)
        return batch[f"s_{which}"]  # precomputed frozen-ViT embeddings

    def _lambda_ds(self, step):
        cfg = self.cfg
        return jnp.maximum(
            0.0, cfg.lambda_ds * (1.0 - step / max(cfg.ds_iter, 1)))

    # ---------------------------------------------------------------- D loss
    def d_loss_fn(self, d_params, state: SolverState, batch, rng,
                  latent: bool, x_fake=None):
        cfg = self.cfg
        x_real, y_org, y_trg = batch["x_src"], batch["y_src"], batch["y_ref"]
        masks = batch.get("masks")
        k1, k2 = jax.random.split(rng)
        x_real_aug = diff_augment(k1, x_real, cfg.diff_aug)

        def d_real_sum(x):
            return self.D.apply({"params": d_params}, x, y_org).sum()

        out_real = self.D.apply({"params": d_params}, x_real_aug, y_org)
        loss_real = bce_logits(out_real, jnp.ones_like(out_real))
        # R1 zero-centered gradient penalty (solver.py:573-583)
        grad = jax.grad(d_real_sum)(x_real_aug)
        loss_reg = 0.5 * jnp.mean(
            jnp.sum(jnp.square(grad.astype(jnp.float32)),
                    axis=(1, 2, 3)))

        if x_fake is None:
            s_trg = self._style(state, batch, y_trg, which="ref",
                                latent=latent)
            s_trg = jax.lax.stop_gradient(s_trg)
            x_fake, _ = self._gen(state.G.params, state.G.state, x_real,
                                  s_trg, y_trg, masks)
        x_fake = jax.lax.stop_gradient(x_fake)
        x_fake = diff_augment(k2, x_fake, cfg.diff_aug)
        out_fake = self.D.apply({"params": d_params}, x_fake, y_trg)
        loss_fake = bce_logits(out_fake, jnp.zeros_like(out_fake))

        loss = loss_real + loss_fake + cfg.lambda_reg * loss_reg
        return loss, {"real": loss_real, "fake": loss_fake, "reg": loss_reg}

    # ---------------------------------------------------------------- G loss
    def g_loss_fn(self, gms_params, state: SolverState, batch, rng,
                  latent: bool, shared_fake=None):
        cfg = self.cfg
        g_params, m_params, s_params = gms_params
        x_real, y_org, y_trg = batch["x_src"], batch["y_src"], batch["y_ref"]
        masks = batch.get("masks")
        adain = cfg.norm_type == "adain"

        def style(which, use_latent, x_override=None):
            if adain:
                if use_latent:
                    return self.M.apply({"params": m_params},
                                        batch[f"z_{which}"], y_trg)
                x = batch[f"x_{which}"] if x_override is None else x_override
                return self.S.apply({"params": s_params}, x, y_trg)
            return batch[f"s_{which}"]

        track = (not latent) and (cfg.norm_type == "sean")
        if shared_fake is None:
            s_trg = style("ref", latent)
            x_fake, g_state = self._gen(g_params, state.G.state, x_real,
                                        s_trg, y_trg, masks,
                                        track_stats=track)
        else:  # FusedProp: forward computed once in the joint loss
            s_trg, x_fake, g_state = shared_fake
        k_aug, _ = jax.random.split(rng)
        out = self.D.apply({"params": state.D.params},
                           diff_augment(k_aug, x_fake, cfg.diff_aug), y_trg)
        loss_adv = bce_logits(out, jnp.ones_like(out))

        # style reconstruction (solver.py:515-517)
        if adain:
            s_pred = self.S.apply({"params": s_params}, x_fake, y_trg)
            loss_sty = l1(s_pred, s_trg)
        elif self._vit is not None:
            # sean: embed x_fake through the frozen ViT in-graph, matching
            # s_pred = nets.feature_extractor(x_fake) (solver.py:515);
            # (N,1,embed_nc) broadcasts against s_trg (N,k,embed_nc)
            loss_sty = l1(self._embed_fake(x_fake, batch.get("_frozen_vit")),
                          s_trg)
        else:
            s_pred = batch.get("s_fake_pred")
            if s_pred is None:
                msg = ("sean mode without set_frozen_nets(vit_variables=...):"
                       " lambda_sty style-reconstruction loss is INACTIVE "
                       "(reference solver.py:515 embeds x_fake via frozen "
                       "ViT)")
                if not self.cfg.allow_degraded_losses:
                    raise ValueError(
                        msg + ". Refusing to train with a silently zeroed "
                        "loss term; pass --allow_degraded_losses (or set "
                        "StarGANv2Config.allow_degraded_losses) to proceed.")
                self._warn_once("sean_sty", msg)
            loss_sty = l1(s_pred, s_trg) if s_pred is not None else jnp.zeros(())

        # diversity-sensitive loss (solver.py:519-527)
        s_trg2 = style("ref2", latent)
        x_fake2, g_state = self._gen(g_params, g_state, x_real, s_trg2, y_trg,
                                     masks, track_stats=track)
        loss_ds = l1(x_fake, jax.lax.stop_gradient(x_fake2))

        # cycle consistency (solver.py:529-533): the reference RECOMPUTES the
        # hpf masks from x_fake (masks = nets.fan.get_heatmap(x_fake))
        if cfg.w_hpf > 0 and self._fan is not None:
            masks_fake = self._heatmaps_fake(x_fake,
                                             batch.get("_frozen_fan"))
        else:
            if cfg.w_hpf > 0 and masks is not None \
                    and "masks_fake" not in batch:
                msg = ("w_hpf > 0 without set_frozen_nets(fan_variables=...):"
                       " cycle pass reuses SOURCE masks instead of "
                       "recomputing fan.get_heatmap(x_fake) (reference "
                       "solver.py:529)")
                if not self.cfg.allow_degraded_losses:
                    raise ValueError(
                        msg + ". Refusing to train with wrong cycle masks; "
                        "pass --allow_degraded_losses (or set "
                        "StarGANv2Config.allow_degraded_losses) to proceed.")
                self._warn_once("cyc_masks", msg)
            masks_fake = batch.get("masks_fake", masks)
        s_org = style("src", False, x_override=x_real) if adain \
            else batch["s_src"]
        x_rec, g_state = self._gen(g_params, g_state, x_fake, s_org, y_org,
                                   masks_fake)
        loss_cyc = l1(x_rec, x_real)

        loss = (loss_adv + cfg.lambda_sty * loss_sty -
                self._lambda_ds(state.step) * loss_ds +
                cfg.lambda_cyc * loss_cyc)
        return loss, (g_state, {"adv": loss_adv, "sty": loss_sty,
                                "ds": loss_ds, "cyc": loss_cyc})

    # ----------------------------------------------------------------- steps
    def d_step(self, state: SolverState, batch, rng, latent: bool):
        (_, metrics), grads = jax.value_and_grad(
            self.d_loss_fn, has_aux=True)(state.D.params, state, batch, rng,
                                          latent)
        updates, opt = self.tx_D.update(grads, state.D.opt_state,
                                        state.D.params)
        return state.replace(D=NetState(
            optax.apply_updates(state.D.params, updates), {}, opt)), metrics

    def g_step(self, state: SolverState, batch, rng, latent: bool):
        adain = self.cfg.norm_type == "adain"
        m_params = state.M.params if adain else None
        s_params = state.S.params if adain else None
        (_, (g_state, metrics)), grads = jax.value_and_grad(
            self.g_loss_fn, has_aux=True)(
            (state.G.params, m_params, s_params), state, batch, rng, latent)
        g_grads, m_grads, s_grads = grads

        updates, g_opt = self.tx_G.update(g_grads, state.G.opt_state,
                                          state.G.params)
        g_params = optax.apply_updates(state.G.params, updates)
        new_m, new_s = state.M, state.S
        if adain and latent:
            # latent pass also updates mapping network + style encoder
            # (solver.py:283-289); reference pass updates G only (:291-298)
            mu, m_opt = self.tx_M.update(m_grads, state.M.opt_state,
                                         state.M.params)
            new_m = NetState(optax.apply_updates(state.M.params, mu), {},
                             m_opt)
            su, s_opt = self.tx_S.update(s_grads, state.S.opt_state,
                                         state.S.params)
            new_s = NetState(optax.apply_updates(state.S.params, su), {},
                             s_opt)
        return state.replace(G=NetState(g_params, g_state, g_opt),
                             M=new_m, S=new_s), metrics

    def fused_pair_step(self, state: SolverState, batch, rng, latent: bool):
        """FusedProp D+G pair: one joint backward over the two existing loss
        functions. Both see the SAME rng, so the primal fake-generation
        forward (and the style nets feeding it) are identical expressions
        XLA CSEs into one pass; stop_gradients route D grads to the D term
        and G/M/S grads to the G term. Simultaneous-update semantics."""
        adain = self.cfg.norm_type == "adain"
        m_params = state.M.params if adain else None
        s_params = state.S.params if adain else None

        cfg = self.cfg
        x_real, y_trg = batch["x_src"], batch["y_ref"]
        masks = batch.get("masks")
        track = (not latent) and (cfg.norm_type == "sean")

        def joint(params):
            d_params, gms = params
            g_params, m_par, s_par = gms
            # the ONE fake-generation forward both terms share: the D term
            # takes stop_gradient(x_fake); the G term differentiates it
            if adain:
                s_trg = (self.M.apply({"params": m_par}, batch["z_ref"],
                                      y_trg) if latent else
                         self.S.apply({"params": s_par}, batch["x_ref"],
                                      y_trg))
            else:
                s_trg = batch["s_ref"]
            x_fake, g_state = self._gen(g_params, state.G.state, x_real,
                                        s_trg, y_trg, masks,
                                        track_stats=track)
            ld, dm = self.d_loss_fn(d_params, state, batch, rng, latent,
                                    x_fake=jax.lax.stop_gradient(x_fake))
            lg, (g_state, gm) = self.g_loss_fn(
                gms, state, batch, rng, latent,
                shared_fake=(s_trg, x_fake, g_state))
            return ld + lg, (g_state, dm, gm)

        (_, (g_state, dm, gm)), (d_grads, gms_grads) = jax.value_and_grad(
            joint, has_aux=True)(
            (state.D.params, (state.G.params, m_params, s_params)))
        g_grads, m_grads, s_grads = gms_grads

        d_up, d_opt = self.tx_D.update(d_grads, state.D.opt_state,
                                       state.D.params)
        new_d = NetState(optax.apply_updates(state.D.params, d_up), {},
                         d_opt)
        g_up, g_opt = self.tx_G.update(g_grads, state.G.opt_state,
                                       state.G.params)
        g_params = optax.apply_updates(state.G.params, g_up)
        new_m, new_s = state.M, state.S
        if adain and latent:
            mu, m_opt = self.tx_M.update(m_grads, state.M.opt_state,
                                         state.M.params)
            new_m = NetState(optax.apply_updates(state.M.params, mu), {},
                             m_opt)
            su, s_opt = self.tx_S.update(s_grads, state.S.opt_state,
                                         state.S.params)
            new_s = NetState(optax.apply_updates(state.S.params, su), {},
                             s_opt)
        state = state.replace(D=new_d,
                              G=NetState(g_params, g_state, g_opt),
                              M=new_m, S=new_s)
        return state, dm, gm

    def train_step(self, state: SolverState, batch, rng):
        """One reference iteration (solver.py:258-313): adain = latent D + ref
        D + latent G + ref G; sean = ref D + ref G. Then EMA + stat EMA."""
        cfg = self.cfg
        adain = cfg.norm_type == "adain"
        metrics = {}
        keys = jax.random.split(rng, 4)
        if cfg.fused_prop:
            if adain:
                state, dm, gm = self.fused_pair_step(state, batch, keys[0],
                                                     latent=True)
                metrics.update({f"D/latent_{k}": v for k, v in dm.items()})
                metrics.update({f"G/latent_{k}": v for k, v in gm.items()})
            state, dm, gm = self.fused_pair_step(state, batch, keys[1],
                                                 latent=False)
            metrics.update({f"D/ref_{k}": v for k, v in dm.items()})
            metrics.update({f"G/ref_{k}": v for k, v in gm.items()})
        else:
            if adain:
                state, m = self.d_step(state, batch, keys[0], latent=True)
                metrics.update({f"D/latent_{k}": v for k, v in m.items()})
            state, m = self.d_step(state, batch, keys[1], latent=False)
            metrics.update({f"D/ref_{k}": v for k, v in m.items()})
            if adain:
                state, m = self.g_step(state, batch, keys[2], latent=True)
                metrics.update({f"G/latent_{k}": v for k, v in m.items()})
            state, m = self.g_step(state, batch, keys[3], latent=False)
            metrics.update({f"G/ref_{k}": v for k, v in m.items()})

        # EMA (solver.py:549-563). NB the reference lerps
        # torch.lerp(param, param_test, beta) -> ema = p + beta (ema - p)
        beta = cfg.ema_beta
        ema_g = ema_update(state.ema_G, state.G.params, beta)
        ema_m = ema_s = None
        if adain:
            ema_m = ema_update(state.ema_M, state.M.params, beta)
            ema_s = ema_update(state.ema_S, state.S.params, beta)
        ema_sean = state.ema_sean_stats
        if ema_sean is not None and "sean_stats" in state.G.state:
            ema_sean = jax.tree_util.tree_map(
                lambda e, p: e + (1 - beta) * (p - e),
                ema_sean, state.G.state["sean_stats"])
        state = state.replace(ema_G=ema_g, ema_M=ema_m, ema_S=ema_s,
                              ema_sean_stats=ema_sean, step=state.step + 1)
        metrics["G/lambda_ds"] = self._lambda_ds(state.step)
        return state, metrics

    def update_sean_stats(self, state: SolverState) -> SolverState:
        """Host-side per-iteration stat finalization (solver.py:552)."""
        if "sean_stats" not in state.G.state:
            return state
        g_state = dict(state.G.state)
        g_state["sean_stats"] = sean_v2_update_stats(g_state["sean_stats"])
        return state.replace(G=state.G.replace(state=g_state))

    def track_stats_step(self, state: SolverState, x, s, y, masks=None
                         ) -> SolverState:
        """One tracking forward of the EMA generator — the body of the
        `update_stats` CLI mode (reference solver.py:379-406: nets_ema
        generator with track_running_stats=True over source/reference
        batches). Accumulators land in ema_sean_stats."""
        g_state = dict(state.G.state)
        if state.ema_sean_stats is not None:
            g_state["sean_stats"] = state.ema_sean_stats
        variables = {"params": state.ema_G, **g_state}
        _, mut = self.G.apply(variables, x, s, masks=masks, labels=y,
                              track_stats=True, mutable=["sean_stats"])
        return state.replace(ema_sean_stats=mut["sean_stats"])

    def finalize_ema_stats(self, state: SolverState) -> SolverState:
        """Finalize the EMA running styles after an update_stats sweep."""
        if state.ema_sean_stats is None:
            return state
        return state.replace(
            ema_sean_stats=sean_v2_update_stats(state.ema_sean_stats))

    @functools.cached_property
    def jit_track_stats_step(self):
        return jax.jit(self.track_stats_step, donate_argnums=0)

    # ------------------------------------------------------------- sampling
    def generate(self, state: SolverState, x, s, y, masks=None,
                 use_ema: bool = True, **kw):
        params = state.ema_G if use_ema else state.G.params
        g_state = dict(state.G.state)
        if use_ema and state.ema_sean_stats is not None:
            g_state["sean_stats"] = state.ema_sean_stats
        out, _ = self._gen(params, g_state, x, s, y, masks, **kw)
        return out

    # ------------------------------------------------------------- pretrain
    # MAE pretraining mode (solver.py:98-204, compute_mae_{d,g}_loss
    # :413-464, utils.py repair_mask :579-585). G params become
    # {'net', 'token'} so the mask token trains with the G optimizer; the
    # filtered checkpoint restore strips it for the train phase.
    def init_pretrain_state(self, rng: jax.Array, mask_ratio: float = 0.75,
                            patch_size: int = 8,
                            mask_token_type: str = "position") -> SolverState:
        from de_i2i_gan_tpu.nn.blocks import MaskToken
        cfg = self.cfg
        self._mae = (mask_ratio, patch_size)
        self.token = MaskToken(mask_token_type, mask_ratio, 3, cfg.img_size)
        base = self.init_state(rng)
        img = jnp.zeros((2, cfg.img_size, cfg.img_size, 3), jnp.float32)
        t_vars = self.token.init({"params": jax.random.fold_in(rng, 7)}, img,
                                 jnp.ones((2, cfg.img_size, cfg.img_size, 1)))
        g_params = {"net": base.G.params, "token": t_vars.get("params", {})}
        return base.replace(G=NetState(g_params, base.G.state,
                                       self.tx_G.init(g_params)),
                            ema_G=jax.tree_util.tree_map(jnp.copy, g_params))

    def _repair(self, g_params, g_state, x_real, s, y_org, masks, rng):
        from de_i2i_gan_tpu.utils.masks import generate_shifted_mask
        mask_ratio, patch_size = self._mae
        b, h, w, _ = x_real.shape
        mae_mask = generate_shifted_mask(rng, b, h, w, patch_size, mask_ratio)
        masked = self.token.apply({"params": g_params["token"]}, x_real,
                                  mae_mask)
        x_fake, g_state = self._gen(g_params["net"], g_state, masked, s,
                                    y_org, masks)
        return x_fake, mae_mask, g_state

    def _pretrain_style(self, params_m, params_s, batch, y_org, latent,
                        x_override=None):
        if self.cfg.norm_type == "adain":
            if latent:
                return self.M.apply({"params": params_m}, batch["z_ref"],
                                    y_org)
            x = batch["x_ref"] if x_override is None else x_override
            return self.S.apply({"params": params_s}, x, y_org)
        return batch["s_ref"]

    def mae_d_loss_fn(self, d_params, state, batch, rng, latent):
        cfg = self.cfg
        x_real, y_org = batch["x_ref"], batch["y_ref"]
        masks = batch.get("masks")

        def d_real_sum(x):
            return self.D.apply({"params": d_params}, x, y_org).sum()

        out_real = self.D.apply({"params": d_params}, x_real, y_org)
        loss_real = bce_logits(out_real, jnp.ones_like(out_real))
        grad = jax.grad(d_real_sum)(x_real)
        loss_reg = 0.5 * jnp.mean(jnp.sum(
            jnp.square(grad.astype(jnp.float32)), axis=(1, 2, 3)))

        m = state.M.params if state.M is not None else None
        s_p = state.S.params if state.S is not None else None
        s = self._pretrain_style(m, s_p, batch, y_org, latent)
        x_fake, _, _ = self._repair(state.G.params, state.G.state, x_real,
                                    jax.lax.stop_gradient(s), y_org, masks,
                                    rng)
        x_fake = jax.lax.stop_gradient(x_fake)
        out_fake = self.D.apply({"params": d_params}, x_fake, y_org)
        loss_fake = bce_logits(out_fake, jnp.zeros_like(out_fake))
        loss = loss_real + loss_fake + cfg.lambda_reg * loss_reg
        return loss, {"real": loss_real, "fake": loss_fake, "reg": loss_reg}

    def mae_g_loss_fn(self, gms_params, state, batch, rng, latent):
        cfg = self.cfg
        g_params, m_params, s_params = gms_params
        x_real, x_real2, y_org = batch["x_ref"], batch["x_ref2"], batch["y_ref"]
        masks = batch.get("masks")
        adain = cfg.norm_type == "adain"

        s = self._pretrain_style(m_params, s_params, batch, y_org, latent)
        x_fake, _, g_state = self._repair(g_params, state.G.state, x_real, s,
                                          y_org, masks, rng)
        out = self.D.apply({"params": state.D.params}, x_fake, y_org)
        loss_adv = bce_logits(out, jnp.ones_like(out))
        # style reconstruction on the repaired image (solver.py:444-446)
        if adain:
            s_pred = self.S.apply({"params": s_params}, x_fake, y_org) \
                if not latent else self.M.apply({"params": m_params},
                                                batch["z_ref"], y_org)
            loss_sty = l1(s_pred, s)
        elif self._vit is not None:
            loss_sty = l1(self._embed_fake(x_fake, batch.get("_frozen_vit")),
                          s)
        else:
            s_pred = batch.get("s_fake_pred")
            loss_sty = l1(s_pred, s) if s_pred is not None else jnp.zeros(())
        loss_rec = l1(x_fake, x_real)
        if adain:
            s_real = self.S.apply({"params": s_params}, x_real, y_org)
            s_real2 = self.S.apply({"params": s_params}, x_real2, y_org)
            loss_ds = l1(s_real, s_real2)
        else:
            loss_ds = jnp.zeros(())
        # reference MAE G loss weighs rec with lambda_rec (solver.py:457)
        loss = (loss_adv + cfg.lambda_sty * loss_sty +
                cfg.lambda_rec * loss_rec +
                self._lambda_ds(state.step) * loss_ds)
        return loss, (g_state, {"adv": loss_adv, "sty": loss_sty,
                                "rec": loss_rec, "ds": loss_ds})

    def pretrain_step(self, state: SolverState, batch, rng):
        cfg = self.cfg
        adain = cfg.norm_type == "adain"
        metrics = {}
        keys = jax.random.split(rng, 4)

        def do_d(state, key, latent, tag):
            (_, m), grads = jax.value_and_grad(
                self.mae_d_loss_fn, has_aux=True)(state.D.params, state,
                                                  batch, key, latent)
            updates, opt = self.tx_D.update(grads, state.D.opt_state,
                                            state.D.params)
            metrics.update({f"D/{tag}_{k}": v for k, v in m.items()})
            return state.replace(D=NetState(
                optax.apply_updates(state.D.params, updates), {}, opt))

        def do_g(state, key, latent, tag):
            m_params = state.M.params if adain else None
            s_params = state.S.params if adain else None
            (_, (g_state, m)), grads = jax.value_and_grad(
                self.mae_g_loss_fn, has_aux=True)(
                (state.G.params, m_params, s_params), state, batch, key,
                latent)
            g_grads, m_grads, s_grads = grads
            updates, g_opt = self.tx_G.update(g_grads, state.G.opt_state,
                                              state.G.params)
            g_params = optax.apply_updates(state.G.params, updates)
            new_m, new_s = state.M, state.S
            if adain and latent:
                mu, m_opt = self.tx_M.update(m_grads, state.M.opt_state,
                                             state.M.params)
                new_m = NetState(optax.apply_updates(state.M.params, mu), {},
                                 m_opt)
                su, s_opt = self.tx_S.update(s_grads, state.S.opt_state,
                                             state.S.params)
                new_s = NetState(optax.apply_updates(state.S.params, su), {},
                                 s_opt)
            metrics.update({f"G/{tag}_{k}": v for k, v in m.items()})
            return state.replace(G=NetState(g_params, g_state, g_opt),
                                 M=new_m, S=new_s)

        if adain:
            state = do_d(state, keys[0], True, "latent")
        state = do_d(state, keys[1], False, "ref")
        if adain:
            state = do_g(state, keys[2], True, "latent")
        state = do_g(state, keys[3], False, "ref")

        ema_g = ema_update(state.ema_G, state.G.params, cfg.ema_beta)
        return state.replace(ema_G=ema_g, step=state.step + 1), metrics

    def _jit_with_frozen(self, step_fn):
        """jit a step and route batches through inject_frozen so frozen-net
        params ride as arguments, not 344 MB of inlined HLO constants."""
        jitted = jax.jit(step_fn, donate_argnums=0)
        if self._vit_vars is None and self._fan_vars is None:
            return jitted

        def run(state, batch, rng):
            return jitted(state, self.inject_frozen(batch), rng)

        return run

    @functools.cached_property
    def jit_pretrain_step(self):
        return self._jit_with_frozen(self.pretrain_step)

    @functools.cached_property
    def jit_train_step(self):
        return self._jit_with_frozen(self.train_step)

    @functools.cached_property
    def jit_generate(self):
        return jax.jit(self.generate,
                       static_argnames=("use_ema", "inference_stats"))
