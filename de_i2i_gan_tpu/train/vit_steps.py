"""ViT classifier / style-embedding workload.

Mirrors /root/reference/defectGAN/models/vit_model.py:9-59 and
trainers/vit_trainer.py: a frozen ViT backbone with a trainable linear head
(`ViTClassifier`, discriminator.py:157-164); modes train / inference /
get_embedding (CLS token of the last hidden state). The reference's AMP
GradScaler is unnecessary on TPU (bf16 needs no loss scaling).

The frozen backbone never enters the differentiated graph: CLS embeddings are
computed under stop_gradient (or precomputed offline — the embedding-dump
path that feeds SEAN, test_vit.py usage).
"""
from __future__ import annotations

import functools
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import optax

from de_i2i_gan_tpu.config import TrainConfig
from de_i2i_gan_tpu.losses.common import cal_loss
from de_i2i_gan_tpu.models.discriminator import ViTClassifier
from de_i2i_gan_tpu.models.vit import ViTEncoder
from de_i2i_gan_tpu.train.optim import make_optimizer
from de_i2i_gan_tpu.train.state import NetState


class ViTSteps:
    def __init__(self, label_nc: int, tcfg: TrainConfig,
                 model_size: str = "base", iters_per_epoch: int = 100,
                 num_epochs: int = 20, vit_variables=None,
                 image_size: int = 224):
        self.label_nc = label_nc
        self.tcfg = tcfg
        self.image_size = image_size
        self.backbone = ViTEncoder(model_size=model_size)
        self.head = ViTClassifier(label_nc)
        self.tx = make_optimizer(tcfg, tcfg.lr[0], iters_per_epoch, num_epochs)
        self._vit_vars = vit_variables

    def init_state(self, rng: jax.Array):
        k_b, k_h = jax.random.split(rng)
        if self._vit_vars is None:
            x = jnp.zeros((1, self.image_size, self.image_size, 3),
                          jnp.float32)
            self._vit_vars = self.backbone.init(k_b, x)
        hidden = self._vit_vars["params"]["cls_token"].shape[-1]
        h_vars = self.head.init(k_h, jnp.zeros((1, hidden), jnp.float32))
        return NetState(h_vars["params"], {}, self.tx.init(h_vars["params"]))

    def embed(self, imgs: jax.Array) -> jax.Array:
        """CLS embedding of the frozen backbone (vit_model.py:50-58). This is
        also the offline embedding-dump path that feeds SEAN blocks."""
        h = self.backbone.apply(self._vit_vars, imgs)
        return jax.lax.stop_gradient(h[:, 0, :])

    def loss_fn(self, params, embeds, labels):
        logits = self.head.apply({"params": params}, embeds)
        loss = cal_loss(logits, labels, self.tcfg.clf_loss_type)
        pred = jnp.argmax(logits, axis=-1)
        target = jnp.argmax(labels, axis=-1) if labels.ndim == 2 else labels
        acc = jnp.mean((pred == target).astype(jnp.float32))
        return loss, acc

    def train_step(self, state: NetState, imgs, labels):
        embeds = self.embed(imgs)
        (loss, acc), grads = jax.value_and_grad(self.loss_fn, has_aux=True)(
            state.params, embeds, labels)
        updates, opt = self.tx.update(grads, state.opt_state, state.params)
        return NetState(optax.apply_updates(state.params, updates), {}, opt), \
            {"loss": loss, "acc": acc}

    def eval_step(self, state: NetState, imgs, labels):
        embeds = self.embed(imgs)
        loss, acc = self.loss_fn(state.params, embeds, labels)
        return {"loss": loss, "acc": acc}

    @functools.cached_property
    def jit_train_step(self):
        return jax.jit(self.train_step)

    @functools.cached_property
    def jit_eval_step(self):
        return jax.jit(self.eval_step)

    @functools.cached_property
    def jit_embed(self):
        return jax.jit(self.embed)


def dump_embeddings(steps: ViTSteps, loader, label_nc: int) -> Dict:
    """Offline per-label CLS embedding bank, the artifact SEAN consumes
    (--embed_path; defectgan_model.py:43-45). Keys are label tuples."""
    bank: Dict = {}
    for imgs, labels, _ in loader:
        embeds = steps.jit_embed(jnp.asarray(imgs))
        import numpy as np
        for e, l in zip(np.asarray(embeds), np.asarray(labels)):
            key = tuple(int(v) for v in l)
            bank.setdefault(key, []).append(e)
    return bank
