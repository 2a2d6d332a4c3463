"""Generators.

DefectGanGenerator mirrors /root/reference/defectGAN/models/networks/generator.py:52-335:
encoder-decoder with conditional-normalization decoder and dual heads
(foreground tanh + spatial-probability sigmoid) composed over the input image:
``out = x * (1 - p) + fg * p`` (generator.py:270).

WGanGenerator mirrors generator.py:11-49 (DCGAN-style upsample stack).

TPU-first notes:
  * NHWC, static shapes, no data-dependent Python control flow — the whole
    forward jits into one XLA program.
  * the reference's conditional NaN scrub (generator.py:266-267) becomes an
    unconditional ``jnp.nan_to_num`` (branchless; free under XLA fusion).
  * the U-Net ``skip_conn`` variant in the reference is broken dead code
    (architecture.py:504 calls NormConvBlock with a stale signature); we
    implement a working skip variant with concatenated encoder features.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from de_i2i_gan_tpu.config import DefectGanConfig, WGanConfig
from de_i2i_gan_tpu.nn.blocks import (
    ConvBlock,
    DeConvBlock,
    NormConvBlock,
    NormResBlock,
    ResBlock,
)
from de_i2i_gan_tpu.nn.layers import Conv2d, upsample_nearest


class DefectGanGenerator(nn.Module):
    cfg: DefectGanConfig

    @nn.compact
    def __call__(self, x: jax.Array, labels: jax.Array,
                 style_feat: Optional[jax.Array] = None, *,
                 train: bool = False, track_stats: bool = False,
                 inference_stats: bool = False, distill: bool = False,
                 bn_groups: int = 1):
        cfg = self.cfg
        assert cfg.num_res % 2 == 0, "num_res must be even"
        scale = 2 ** cfg.num_scales
        assert x.shape[1] % scale == 0 and x.shape[2] % scale == 0, (
            f"image dims {x.shape[1]}x{x.shape[2]} must be divisible by "
            f"2**num_scales={scale} for the encoder/decoder to compose "
            f"(the reference requires power-of-2 sizes, defectgan_model.py:22)")
        dt = cfg.dtype
        x = x.astype(dt)

        norm_kw = dict(track_stats=track_stats, inference_stats=inference_stats,
                       distill=distill)
        style_kw = dict(label_nc=cfg.label_nc, hidden_nc=cfg.hidden_nc,
                        embed_nc=cfg.embed_nc, style_distill=cfg.style_distill,
                        padding="same", padding_mode="reflect", act="relu",
                        use_spectral=cfg.use_spectral, add_noise=cfg.add_noise,
                        dtype=dt, use_pallas=cfg.use_pallas)

        # stem: 7x7 conv + BN + leaky-relu (generator.py:67-73). bn_groups>1
        # scopes BatchNorm statistics to contiguous batch groups so a fused
        # multi-direction 2B forward (train/steps.py fused_g_forward) stays
        # numerically identical to separate B forwards.
        feat = ConvBlock(cfg.ngf, (7, 7), (1, 1), "same", "reflect",
                         norm="batch", act="leaky_relu",
                         use_spectral=cfg.use_spectral, bn_groups=bn_groups,
                         dtype=dt, name="stem")(x, train=train)

        crt = cfg.ngf
        skips = []
        # encoder: stride-2 convs (generator.py:107-116)
        for i in range(cfg.num_scales):
            skips.append(feat)
            crt *= 2
            feat = ConvBlock(crt, (4, 4), (2, 2), 1, "reflect",
                             norm="batch", act="leaky_relu",
                             use_spectral=cfg.use_spectral,
                             bn_groups=bn_groups, dtype=dt,
                             name=f"enc_{i}")(feat, train=train)

        # encoder residual blocks (generator.py:118-126)
        for i in range(cfg.num_res // 2):
            feat = ResBlock(crt, (3, 3), "same", "reflect", norm="batch",
                            act="leaky_relu", use_spectral=cfg.use_spectral,
                            bn_groups=bn_groups, dtype=dt,
                            name=f"enc_res_{i}")(feat, train=train)

        # decoder residual blocks with style norm (generator.py:139-152)
        for i in range(cfg.num_res // 2):
            feat = NormResBlock(cfg.style_norm_block_type, crt, **style_kw,
                                name=f"dec_res_{i}")(
                feat, labels, style_feat, train=train, **norm_kw)

        # decoder upsampling style-norm conv blocks (generator.py:178-191)
        for i in range(cfg.num_scales):
            if cfg.skip_conn:
                feat = jnp.concatenate([feat, _shrink_to(skips[-1 - i], feat)],
                                       axis=-1)
            crt //= 2
            feat = NormConvBlock(cfg.style_norm_block_type, crt, **style_kw,
                                 kernel_size=(3, 3), up_scale=True,
                                 name=f"dec_{i}")(
                feat, labels, style_feat, train=train, **norm_kw)

        # branchless NaN scrub (generator.py:266-267)
        feat = jnp.nan_to_num(feat)

        # dual heads (generator.py:224-241) + composition (generator.py:270)
        foreground = DeConvBlock(3, (3, 3), padding="same",
                                 padding_mode="reflect", up_scale=False,
                                 act="tanh", dtype=dt,
                                 name="foreground_head")(feat, train=train)
        spatial_prob = DeConvBlock(1, (3, 3), padding="same",
                                   padding_mode="reflect", up_scale=False,
                                   act="sigmoid", dtype=dt,
                                   name="distribution_head")(feat, train=train)

        output = x * (1.0 - spatial_prob) + foreground * spatial_prob
        if cfg.cycle_gan:
            return foreground, spatial_prob
        return output, spatial_prob


def _shrink_to(skip: jax.Array, feat: jax.Array) -> jax.Array:
    """Average-pool an encoder feature down to the decoder feature's spatial
    size for U-Net concatenation (working replacement of the reference's broken
    skip_conn path)."""
    fh = skip.shape[1] // feat.shape[1]
    if fh <= 1:
        return skip
    from de_i2i_gan_tpu.nn.layers import avg_pool
    return avg_pool(skip, fh, fh)


class WGanGenerator(nn.Module):
    """Noise -> image DCGAN-style generator (generator.py:11-49).

    Spatial schedule for image_size=64, num_layers=3:
    1 -> 2 (up) -> 4 -> 8 -> 16 (deconvs) -> 32 ... final up to 64 + conv+tanh.
    """

    cfg: WGanConfig

    @nn.compact
    def __call__(self, noise: jax.Array, *, train: bool = False) -> jax.Array:
        cfg = self.cfg
        dt = cfg.dtype
        n = noise.shape[0]
        x = noise.reshape(n, 1, 1, cfg.noise_dim).astype(dt)
        x = upsample_nearest(x)  # 2x2

        crt = cfg.ngf * (2 ** cfg.num_layers)
        x = DeConvBlock(crt, (4, 4), padding="same", norm="batch", act="relu",
                        up_scale=True, dtype=dt, name="head")(x, train=train)
        for i in range(cfg.num_layers):
            crt //= 2
            x = DeConvBlock(crt, (4, 4), padding="same", norm="batch",
                            act="relu", up_scale=True, dtype=dt,
                            name=f"up_{i}")(x, train=train)
        x = upsample_nearest(x)
        x = Conv2d(3, (4, 4), (1, 1), "same", dtype=dt, name="to_rgb")(x)
        return nn.tanh(x)
