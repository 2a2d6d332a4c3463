"""Discriminators.

DefectGanDiscriminator mirrors
/root/reference/defectGAN/models/networks/discriminator.py:49-98: a StarGAN
discriminator with a PatchGAN ``src`` head (3x3 conv, per-patch real/fake
logits) and a multi-label ``cls`` head whose kernel covers the whole remaining
spatial extent.

WGanDiscriminator mirrors discriminator.py:10-46.
ViTClassifier mirrors discriminator.py:157-164 (a single linear head).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from de_i2i_gan_tpu.config import DefectGanConfig, WGanConfig
from de_i2i_gan_tpu.nn.blocks import ConvBlock
from de_i2i_gan_tpu.nn.layers import Dense, adaptive_avg_pool, max_pool


class DefectGanDiscriminator(nn.Module):
    cfg: DefectGanConfig

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool = False):
        cfg = self.cfg
        dt = cfg.dtype
        x = x.astype(dt)
        crt = cfg.ndf

        # stem + stride-2 leaky conv stack, no norm (discriminator.py:60-79)
        feat = ConvBlock(crt, (4, 4), (2, 2), 1, "reflect", act="leaky_relu",
                         use_spectral=cfg.use_spectral, dtype=dt,
                         name="stem")(x, train=train)
        for i in range(cfg.num_layers):
            crt *= 2
            feat = ConvBlock(crt, (4, 4), (2, 2), 1, "reflect",
                             act="leaky_relu", use_spectral=cfg.use_spectral,
                             dtype=dt, name=f"enc_{i}")(feat, train=train)

        # heads (discriminator.py:78-98)
        ks = cfg.image_size // (2 ** (cfg.num_layers + 1))
        assert ks >= 1, (
            f"image_size {cfg.image_size} too small for num_layers {cfg.num_layers}")
        cls_logits = ConvBlock(cfg.label_nc, (ks, ks), dtype=dt,
                               name="cls_clf")(feat, train=train)
        src_logits = ConvBlock(1, (3, 3), (1, 1), "same", "reflect", dtype=dt,
                               name="src_clf")(feat, train=train)
        return src_logits, cls_logits.reshape(x.shape[0], cfg.label_nc)


class WGanDiscriminator(nn.Module):
    """Conv critic (discriminator.py:10-46)."""

    cfg: WGanConfig

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool = False) -> jax.Array:
        cfg = self.cfg
        dt = cfg.dtype
        x = x.astype(dt)
        feat = ConvBlock(cfg.ndf, (7, 7), (2, 2), 3, "reflect", norm="batch",
                         act="relu", dtype=dt, name="stem")(x, train=train)
        feat = max_pool(feat, 3, 2, 1)
        crt = cfg.ndf
        for i in range(cfg.num_layers):
            crt *= 2
            feat = ConvBlock(crt, (3, 3), (2, 2), 1, norm="batch", act="relu",
                             dtype=dt, name=f"enc_{i}")(feat, train=train)
        feat = adaptive_avg_pool(feat)
        return Dense(1, dtype=dt, name="critic")(feat)


class ViTClassifier(nn.Module):
    """Linear head over frozen ViT CLS embeddings (discriminator.py:157-164)."""

    label_nc: int

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        return Dense(self.label_nc, name="clf")(x)
