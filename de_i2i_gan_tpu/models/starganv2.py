"""StarGAN v2 networks (+ the author's SEAN modification), flax/NHWC.

Mirrors /root/reference/stargan-v2/core/model.py:
  ResBlk        (:26-67)   pre-act residual, sqrt(2) scaling, optional
                           affine instance norm, avg-pool downsample
  AdaIN         (:70-80)   style vector -> fc -> (gamma, beta)
  AdainResBlk   (:83-123)  style-modulated upsample residual; when w_hpf > 0
                           the shortcut is dropped (residual only)
  SEAN          (:139-236) ViT-embedding MLP + per-domain label embedding,
                           per-domain running style stats, multi-reference
                           mix_alpha interpolation, std_weight sampling
  SEANResBlk    (:278-318)
  Generator     (:321-393) from_rgb -> encode ResBlks -> decode Adain/SEAN
                           ResBlks -> to_rgb, FAN-mask skip cache + high-pass
                           fusion at 32/64/128 px, layer_split_index style
                           control
  MappingNetwork (:442-471) latent -> per-domain style MLPs
  StyleEncoder  (:474-505)
  Discriminator (:508-532) multi-domain output indexed by y

Domain labels y are integer ids (N,), unlike defectGAN's multilabel rows.
Stateful SEAN knobs (std_weight, mix_alpha, track/inference flags) are call
arguments instead of module attribute mutation.
"""
from __future__ import annotations

import math
from typing import Any, Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from flax import linen as nn

import functools

from de_i2i_gan_tpu.nn.layers import (Conv2d as _Conv2d, Dense as _Dense,
                                      avg_pool, he_init, upsample_nearest)
from de_i2i_gan_tpu.nn.normalization import instance_norm

# the reference he_inits every Conv2d/Linear in these nets
# (core/solver.py:75-79); weight-import parity is unaffected (loads overwrite)
Conv2d = functools.partial(_Conv2d, kernel_init=he_init)
Dense = functools.partial(_Dense, kernel_init=he_init)

Dtype = Any
_SQRT2 = math.sqrt(2.0)


def _affine_in(x, scale, bias):
    return instance_norm(x) * scale + bias


class AffineInstanceNorm(nn.Module):
    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones_init(), (c,),
                           jnp.float32)
        bias = self.param("bias", nn.initializers.zeros_init(), (c,),
                          jnp.float32)
        return _affine_in(x, scale.astype(x.dtype), bias.astype(x.dtype))


class ResBlk(nn.Module):
    features: int
    normalize: bool = False
    downsample: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        f_in = x.shape[-1]
        learned_sc = f_in != self.features
        # shortcut
        s = x
        if learned_sc:
            s = Conv2d(self.features, (1, 1), dtype=self.dtype,
                       name="conv1x1")(s)
        if self.downsample:
            s = avg_pool(s, 2, 2)
        # residual
        h = x
        if self.normalize:
            h = AffineInstanceNorm(name="norm1")(h)
        h = nn.leaky_relu(h, 0.2)
        h = Conv2d(f_in, (3, 3), padding=1, use_bias=True, dtype=self.dtype,
                   name="conv1")(h)
        if self.downsample:
            h = avg_pool(h, 2, 2)
        if self.normalize:
            h = AffineInstanceNorm(name="norm2")(h)
        h = nn.leaky_relu(h, 0.2)
        h = Conv2d(self.features, (3, 3), padding=1, use_bias=True,
                   dtype=self.dtype, name="conv2")(h)
        return (s + h) / _SQRT2


class StyleAdaIN(nn.Module):
    """AdaIN (model.py:70-80): fc(style) -> gamma, beta."""

    num_features: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, s):
        h = Dense(self.num_features * 2, dtype=self.dtype, name="fc")(s)
        gamma, beta = jnp.split(h, 2, axis=-1)
        from de_i2i_gan_tpu.ops.fused import modulated_instance_norm
        return modulated_instance_norm(x, gamma, beta)


class SEANv2(nn.Module):
    """The author's SEAN for stargan-v2 (model.py:139-236)."""

    embed_nc: int
    norm_nc: int
    label_nc: int
    hidden_nc: int = 128
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, labels, feat, *, track_stats: bool = False,
                 inference_stats: bool = False, std_weight: float = 1.0,
                 mix_alpha: Optional[jax.Array] = None):
        c = x.shape[-1]

        mean_s = self.variable("sean_stats", "mean", jnp.zeros,
                               (self.label_nc, self.hidden_nc), jnp.float32)
        std_s = self.variable("sean_stats", "std", jnp.zeros,
                              (self.label_nc, self.hidden_nc), jnp.float32)
        sum_s = self.variable("sean_stats", "sum", jnp.zeros,
                              (self.label_nc, self.hidden_nc), jnp.float32)
        sumsq_s = self.variable("sean_stats", "sumsq", jnp.zeros,
                                (self.label_nc, self.hidden_nc), jnp.float32)
        count_s = self.variable("sean_stats", "count", jnp.zeros,
                                (self.label_nc,), jnp.float32)

        if inference_stats:
            # feat: (N, hidden_nc) noise; sample from per-domain stats
            # (model.py:209-215; mean/std stored the right way round, unlike
            # defectGAN's swapped write — stargan-v2's update_stats is correct)
            mu = mean_s.value[labels].astype(self.dtype)
            sd = std_s.value[labels].astype(self.dtype)
            mix_feat = feat.astype(self.dtype) * sd * std_weight + mu
        else:
            enc = nn.relu(Dense(self.hidden_nc, dtype=self.dtype,
                                name="mlp_shared")(feat.astype(self.dtype)))
            latent = nn.Embed(self.label_nc, self.hidden_nc,
                              name="label_embedding")(labels).astype(self.dtype)
            mix_feat = enc + latent[:, None, :]
            if mix_alpha is not None:
                w = mix_alpha / mix_alpha.sum(axis=1, keepdims=True)
                mix_feat = jnp.sum(mix_feat * w[..., None], axis=1)
            else:
                mix_feat = mix_feat.mean(axis=1)
            if track_stats:
                tracked = jax.lax.stop_gradient(mix_feat.astype(jnp.float32))
                sum_s.value = sum_s.value.at[labels].add(tracked)
                sumsq_s.value = sumsq_s.value.at[labels].add(
                    jnp.square(tracked))
                count_s.value = count_s.value.at[labels].add(1.0)

        gamma = Dense(self.norm_nc, dtype=self.dtype, name="mlp_gamma")(mix_feat)
        beta = Dense(self.norm_nc, dtype=self.dtype, name="mlp_beta")(mix_feat)
        from de_i2i_gan_tpu.ops.fused import modulated_instance_norm
        return modulated_instance_norm(x, gamma, beta)


class _StyledResBlk(nn.Module):
    """Shared body of AdainResBlk / SEANResBlk (model.py:83-123, 278-318)."""

    features: int
    norm_type: str  # 'adain' | 'sean'
    style_dim: int = 64
    embed_nc: int = 768
    label_nc: int = 3
    hidden_nc: int = 256
    w_hpf: float = 0.0
    upsample: bool = False
    dtype: Dtype = jnp.float32

    def _norm(self, name, nc):
        if self.norm_type == "adain":
            return StyleAdaIN(nc, dtype=self.dtype, name=name)
        return SEANv2(self.embed_nc, nc, self.label_nc, self.hidden_nc,
                      dtype=self.dtype, name=name)

    @nn.compact
    def __call__(self, x, s, labels=None, **sean_kw):
        f_in = x.shape[-1]
        learned_sc = f_in != self.features

        def norm(name, nc, h):
            if self.norm_type == "adain":
                return StyleAdaIN(nc, dtype=self.dtype, name=name)(h, s)
            return SEANv2(self.embed_nc, nc, self.label_nc, self.hidden_nc,
                          dtype=self.dtype, name=name)(h, labels, s, **sean_kw)

        h = norm("norm1", f_in, x)
        h = nn.leaky_relu(h, 0.2)
        if self.upsample:
            h = upsample_nearest(h)
        h = Conv2d(self.features, (3, 3), padding=1, use_bias=True,
                   dtype=self.dtype, name="conv1")(h)
        h = norm("norm2", self.features, h)
        h = nn.leaky_relu(h, 0.2)
        h = Conv2d(self.features, (3, 3), padding=1, use_bias=True,
                   dtype=self.dtype, name="conv2")(h)

        if self.w_hpf == 0:
            sc = x
            if self.upsample:
                sc = upsample_nearest(sc)
            if learned_sc:
                sc = Conv2d(self.features, (1, 1), dtype=self.dtype,
                            name="conv1x1")(sc)
            h = (h + sc) / _SQRT2
        return h


def high_pass(x: jax.Array, w_hpf: float) -> jax.Array:
    """Depthwise 3x3 Laplacian high-pass filter (model.py:126-136)."""
    c = x.shape[-1]
    filt = jnp.asarray([[-1, -1, -1], [-1, 8.0, -1], [-1, -1, -1]],
                       x.dtype) / w_hpf
    kernel = jnp.tile(filt[:, :, None, None], (1, 1, 1, c))  # HWIO depthwise
    return jax.lax.conv_general_dilated(
        x, kernel, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=c)


class Generator(nn.Module):
    """model.py:321-393."""

    img_size: int = 256
    style_dim: int = 64
    max_conv_dim: int = 512
    w_hpf: float = 1.0
    norm_type: str = "adain"
    embed_nc: int = 768
    label_nc: int = 3
    hidden_nc: int = 256
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, s, masks=None, labels=None,
                 layer_split_index: Optional[Tuple[int, ...]] = None,
                 **sean_kw):
        dim_in = 2 ** 14 // self.img_size
        repeat_num = int(np.log2(self.img_size)) - 4
        if self.w_hpf > 0:
            repeat_num += 1

        x = Conv2d(dim_in, (3, 3), padding=1, use_bias=True, dtype=self.dtype,
                   name="from_rgb")(x.astype(self.dtype))

        # encoder plan + mirrored decoder plan
        dims = []
        d = dim_in
        for _ in range(repeat_num):
            dims.append((d, min(d * 2, self.max_conv_dim)))
            d = min(d * 2, self.max_conv_dim)

        cache = {}
        for i, (di, do) in enumerate(dims):
            if masks is not None and x.shape[1] in (32, 64, 128):
                cache[x.shape[1]] = x
            x = ResBlk(do, normalize=True, downsample=True, dtype=self.dtype,
                       name=f"encode_{i}")(x)
        for i in range(2):
            x = ResBlk(d, normalize=True, dtype=self.dtype,
                       name=f"encode_bottleneck_{i}")(x)

        blk_kw = dict(norm_type=self.norm_type, style_dim=self.style_dim,
                      embed_nc=self.embed_nc, label_nc=self.label_nc,
                      hidden_nc=self.hidden_nc, w_hpf=self.w_hpf,
                      dtype=self.dtype)

        def style_for(idx):
            if layer_split_index is None:
                return s
            # s: (N, 2, ...) -> second style for listed decoder layers
            # (model.py:381-386)
            return s[:, 1] if idx in layer_split_index else s[:, 0]

        dec_idx = 0
        for i in range(2):
            x = _StyledResBlk(d, upsample=False, **blk_kw,
                              name=f"decode_bottleneck_{i}")(
                x, style_for(dec_idx), labels, **sean_kw)
            dec_idx += 1
        for i, (di, do) in enumerate(reversed(dims)):
            x = _StyledResBlk(di, upsample=True, **blk_kw,
                              name=f"decode_{i}")(
                x, style_for(dec_idx), labels, **sean_kw)
            dec_idx += 1
            if masks is not None and x.shape[1] in (32, 64, 128):
                mask = masks[0] if x.shape[1] == 32 else masks[1]
                if mask.shape[1] != x.shape[1]:
                    mask = jax.image.resize(
                        mask, (mask.shape[0], x.shape[1], x.shape[1], 1),
                        "bilinear")
                x = x + high_pass(mask * cache[x.shape[1]], self.w_hpf)

        x = AffineInstanceNorm(name="to_rgb_norm")(x)
        x = nn.leaky_relu(x, 0.2)
        return Conv2d(3, (1, 1), use_bias=True, dtype=self.dtype,
                      name="to_rgb")(x)


class MappingNetwork(nn.Module):
    """model.py:442-471: z + domain -> style."""

    latent_dim: int = 16
    style_dim: int = 64
    num_domains: int = 2
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, z, y):
        h = z.astype(self.dtype)
        h = nn.relu(Dense(512, dtype=self.dtype, name="shared_0")(h))
        for i in range(3):
            h = nn.relu(Dense(512, dtype=self.dtype, name=f"shared_{i+1}")(h))
        outs = []
        for d in range(self.num_domains):
            u = h
            for j in range(3):
                u = nn.relu(Dense(512, dtype=self.dtype,
                                  name=f"unshared_{d}_{j}")(u))
            outs.append(Dense(self.style_dim, dtype=self.dtype,
                              name=f"unshared_{d}_out")(u))
        out = jnp.stack(outs, axis=1)  # (N, num_domains, style_dim)
        return out[jnp.arange(y.shape[0]), y]


class StyleEncoder(nn.Module):
    """model.py:474-505: image + domain -> style."""

    img_size: int = 256
    style_dim: int = 64
    num_domains: int = 2
    max_conv_dim: int = 512
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, y):
        dim_in = 2 ** 14 // self.img_size
        h = Conv2d(dim_in, (3, 3), padding=1, use_bias=True, dtype=self.dtype,
                   name="from_rgb")(x.astype(self.dtype))
        repeat_num = int(np.log2(self.img_size)) - 2
        d = dim_in
        for i in range(repeat_num):
            d = min(d * 2, self.max_conv_dim)
            h = ResBlk(d, downsample=True, dtype=self.dtype,
                       name=f"block_{i}")(h)
        h = nn.leaky_relu(h, 0.2)
        h = Conv2d(d, (4, 4), use_bias=True, dtype=self.dtype, name="conv4")(h)
        h = nn.leaky_relu(h, 0.2)
        h = h.reshape(h.shape[0], -1)
        outs = [Dense(self.style_dim, dtype=self.dtype, name=f"unshared_{i}")(h)
                for i in range(self.num_domains)]
        out = jnp.stack(outs, axis=1)
        return out[jnp.arange(y.shape[0]), y]


class StarGANv2Discriminator(nn.Module):
    """model.py:508-532: multi-domain real/fake logits indexed by y."""

    img_size: int = 256
    num_domains: int = 2
    max_conv_dim: int = 512
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, y):
        dim_in = 2 ** 14 // self.img_size
        h = Conv2d(dim_in, (3, 3), padding=1, use_bias=True, dtype=self.dtype,
                   name="from_rgb")(x.astype(self.dtype))
        repeat_num = int(np.log2(self.img_size)) - 2
        d = dim_in
        for i in range(repeat_num):
            d = min(d * 2, self.max_conv_dim)
            h = ResBlk(d, downsample=True, dtype=self.dtype,
                       name=f"block_{i}")(h)
        h = nn.leaky_relu(h, 0.2)
        h = Conv2d(d, (4, 4), use_bias=True, dtype=self.dtype, name="conv4")(h)
        h = nn.leaky_relu(h, 0.2)
        h = Conv2d(self.num_domains, (1, 1), use_bias=True, dtype=self.dtype,
                   name="head")(h)
        out = h.reshape(h.shape[0], -1)
        return out[jnp.arange(y.shape[0]), y]


def sean_v2_update_stats(sean_stats, eps: float = 1e-5):
    """Finalize per-domain running styles (model.py:186-201); same layout as
    de_i2i_gan_tpu.nn.normalization.sean_update_stats."""
    from de_i2i_gan_tpu.nn.normalization import sean_update_stats
    return sean_update_stats(sean_stats, eps)
