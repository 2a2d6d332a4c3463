"""Style extractor for the AdaIN path.

Mirrors /root/reference/defectGAN/models/networks/extractor.py:36-96:
  * sean_alpha == 1: image -> conv/ResBlock downsample pyramid -> hidden_nc
  * sean_alpha == 0: (label, noise) latent -> MLP -> hidden_nc
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from flax import linen as nn

from de_i2i_gan_tpu.config import DefectGanConfig
from de_i2i_gan_tpu.nn.blocks import ConvBlock, ResBlock
from de_i2i_gan_tpu.nn.layers import Dense


class StyleExtractor(nn.Module):
    cfg: DefectGanConfig

    @nn.compact
    def __call__(self, x: jax.Array, labels: jax.Array, *,
                 train: bool = False) -> jax.Array:
        cfg = self.cfg
        dt = cfg.dtype
        max_dim = 256
        if cfg.sean_alpha == 0:
            # latent MLP path (extractor.py:45-50, 88-91)
            noise_dim = cfg.latent_dim - cfg.label_nc
            noise = jax.random.normal(self.make_rng("latent"),
                                      (labels.shape[0], noise_dim), dt)
            h = jnp.concatenate([labels.astype(dt), noise], axis=1)
            h = nn.relu(Dense(max_dim, dtype=dt, name="fc_in")(h))
            for i in range(3):
                h = nn.relu(Dense(max_dim, dtype=dt, name=f"fc_{i}")(h))
            return Dense(cfg.hidden_nc, dtype=dt, name="fc_out")(h)

        # image pyramid path (extractor.py:51-80, 92-93); default when
        # sean_alpha is None/1 under the adain block type. The reference
        # restricts sizes to 64..1024; any power of two >= 16 works (the 4x4
        # head sees a 4x4 map after log2(size)-3 halvings).
        size = cfg.image_size
        assert size >= 16 and (size & (size - 1)) == 0, \
            f"image_size must be a power of two >= 16, got {size}"
        num_blocks = int(math.log2(cfg.image_size)) - 3
        crt = cfg.ndf
        h = ConvBlock(crt, (7, 7), (2, 2), 3, "reflect", act="leaky_relu",
                      dtype=dt, name="stem")(x.astype(dt), train=train)
        for i in range(num_blocks):
            crt = min(crt * 2, max_dim)
            h = ResBlock(crt, (3, 3), "same", "reflect", norm="instance",
                         act="leaky_relu", down_scale=True, dtype=dt,
                         name=f"res_{i}")(h, train=train)
        h = ConvBlock(cfg.hidden_nc, (4, 4), dtype=dt, name="head")(h, train=train)
        return h.reshape(h.shape[0], cfg.hidden_nc)
