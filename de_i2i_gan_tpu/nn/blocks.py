"""Composite conv blocks of the DefectGAN family.

Reference semantics: /root/reference/defectGAN/models/networks/architecture.py
  ConvBlock      (:79-118)  conv -> (norm) -> act, optional spectral norm
  DeConvBlock    (:29-76)   (2x upsample) -> conv -> (noise) -> (norm) -> act
  ResBlock       (:121-176) two conv blocks + identity / downscale shortcut
  NormConvBlock  (:179-257) (2x upsample) -> style-norm -> act -> conv -> noise
  NormResBlock   (:260-371) two style-norm conv branches + style-norm shortcut
  NoiseInjection (:374-389) learned scalar weight x fresh N(0,1) HxW noise
  MaskToken      (:392-418) learnable fill for masked patches (MAE pretraining)
  EmbedEncoder   (:420-431), LatentDecoder (:434-448) style MLPs
"""
from __future__ import annotations

from typing import Any, Optional, Tuple, Union

import jax
import jax.numpy as jnp
from flax import linen as nn

from de_i2i_gan_tpu.nn.layers import Conv2d, Dense, avg_pool, upsample_nearest
from de_i2i_gan_tpu.nn.normalization import SPADE, SEAN, AdaIN

Dtype = Any


def get_act(act: Optional[str]):
    """Activation dispatch (architecture.py:12-26)."""
    if act is None:
        return lambda x: x
    if act == "leaky_relu":
        return lambda x: nn.leaky_relu(x, negative_slope=0.2)
    if act == "relu":
        return nn.relu
    if act == "sigmoid":
        return nn.sigmoid
    if act == "tanh":
        return nn.tanh
    raise NameError(f"activation layer named {act} not defined")


def _norm_layer(norm: Optional[str], dtype, name: str):
    """Base norm dispatch: 'batch' | 'instance' | None."""
    if norm is None:
        return None
    if norm == "batch":
        # torch BatchNorm2d defaults: eps 1e-5, momentum 0.1 (flax: 0.9)
        return nn.BatchNorm(momentum=0.9, epsilon=1e-5, dtype=dtype, name=name)
    if norm == "instance":
        from de_i2i_gan_tpu.nn.normalization import instance_norm
        return instance_norm
    raise NameError(f"norm layer named {norm} not defined")


def _apply_norm(norm, y, *, train: bool, bn_groups: int = 1):
    """Apply a base norm; for BatchNorm in train mode with bn_groups > 1,
    normalize each contiguous batch group with ITS OWN batch statistics (the
    same module instance, so params/running stats are shared and the running
    averages see the groups sequentially). This makes a 2B-batched
    "fused" generator forward (config.fused_g_forward; train/steps.py)
    numerically IDENTICAL to the two separate B-batched forwards it fuses —
    batching is then purely an XLA scheduling choice, not a semantics
    change. Exactness is proven by tests/test_fused_g_equivalence.py."""
    if norm is None:
        return y
    if not isinstance(norm, nn.Module):
        return norm(y)
    if train and bn_groups > 1:
        n = y.shape[0]
        assert n % bn_groups == 0, (
            f"batch {n} not divisible into {bn_groups} BN groups")
        h = n // bn_groups
        parts = [norm(y[i * h:(i + 1) * h], use_running_average=False)
                 for i in range(bn_groups)]
        return jnp.concatenate(parts, axis=0)
    return norm(y, use_running_average=not train)


class NoiseInjection(nn.Module):
    """StyleGAN-style noise injection (architecture.py:374-389).

    weight starts at zero; fresh standard-normal (N, H, W, 1) noise per call,
    drawn from the 'noise' PRNG stream.
    """

    weight_type: str = "constant"
    nc: Optional[int] = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        if self.weight_type == "constant":
            w = self.param("weight", nn.initializers.zeros_init(), (1,), jnp.float32)
        elif self.weight_type == "vector":
            assert self.nc is not None
            w = self.param("weight", nn.initializers.zeros_init(), (self.nc,),
                           jnp.float32)
        else:
            raise NameError(f"weight type named {self.weight_type} not defined")
        n, h, w_, _ = x.shape
        noise = jax.random.normal(self.make_rng("noise"), (n, h, w_, 1), x.dtype)
        return x + w.astype(x.dtype) * noise


class ConvBlock(nn.Module):
    """conv -> (norm) -> act (architecture.py:79-118)."""

    features: int
    kernel_size: Tuple[int, int] = (3, 3)
    strides: Tuple[int, int] = (1, 1)
    padding: Union[int, str] = 0
    padding_mode: str = "zeros"
    use_bias: bool = False
    norm: Optional[str] = None  # 'batch' | 'instance' | None
    act: Optional[str] = None
    use_spectral: bool = False
    bn_groups: int = 1  # per-group BN stats for fused multi-direction batches
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool = False) -> jax.Array:
        y = Conv2d(self.features, self.kernel_size, self.strides, self.padding,
                   self.padding_mode, use_bias=self.use_bias,
                   use_spectral=self.use_spectral, dtype=self.dtype,
                   name="conv")(x, update_sn=train)
        y = _apply_norm(_norm_layer(self.norm, self.dtype, "norm"), y,
                        train=train, bn_groups=self.bn_groups)
        return get_act(self.act)(y)


class DeConvBlock(nn.Module):
    """(2x upsample) -> conv -> (noise) -> (norm) -> act (architecture.py:29-76)."""

    features: int
    kernel_size: Tuple[int, int] = (3, 3)
    strides: Tuple[int, int] = (1, 1)
    padding: Union[int, str] = 0
    padding_mode: str = "zeros"
    use_bias: bool = False
    up_scale: bool = True
    norm: Optional[str] = None
    act: Optional[str] = None
    use_spectral: bool = False
    add_noise: bool = False
    bn_groups: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool = False) -> jax.Array:
        if self.up_scale:
            x = upsample_nearest(x)
        y = Conv2d(self.features, self.kernel_size, self.strides, self.padding,
                   self.padding_mode, use_bias=self.use_bias,
                   use_spectral=self.use_spectral, dtype=self.dtype,
                   name="conv")(x, update_sn=train)
        if self.add_noise:
            y = NoiseInjection(name="noise")(y)
        y = _apply_norm(_norm_layer(self.norm, self.dtype, "norm"), y,
                        train=train, bn_groups=self.bn_groups)
        return get_act(self.act)(y)


class ResBlock(nn.Module):
    """Two conv blocks + identity (or 1x1-conv + avg-pool when down-scaling)
    shortcut (architecture.py:121-176)."""

    features: int
    kernel_size: Tuple[int, int] = (3, 3)
    padding: Union[int, str] = "same"
    padding_mode: str = "zeros"
    norm: Optional[str] = "instance"
    act: Optional[str] = "relu"
    use_spectral: bool = False
    down_scale: bool = False
    bn_groups: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool = False) -> jax.Array:
        f_in = x.shape[-1]
        y = ConvBlock(f_in, self.kernel_size, (1, 1), self.padding,
                      self.padding_mode, norm=self.norm, act=self.act,
                      use_spectral=self.use_spectral,
                      bn_groups=self.bn_groups, dtype=self.dtype,
                      name="conv_0")(x, train=train)
        if self.down_scale:
            y = avg_pool(y, 2, 2)
        y = ConvBlock(self.features, self.kernel_size, (1, 1), self.padding,
                      self.padding_mode, norm=self.norm, act=None,
                      use_spectral=self.use_spectral,
                      bn_groups=self.bn_groups, dtype=self.dtype,
                      name="conv_1")(y, train=train)
        if self.down_scale:
            s = ConvBlock(self.features, (1, 1), (1, 1), 0, self.padding_mode,
                          norm=self.norm, act=None,
                          use_spectral=self.use_spectral,
                          bn_groups=self.bn_groups, dtype=self.dtype,
                          name="conv_s")(x, train=train)
            s = avg_pool(s, 2, 2)
        else:
            s = x
        return y + s


class _StyleNorm(nn.Module):
    """Style-norm dispatch used by NormConvBlock/NormResBlock
    (architecture.py:213-227,291-318): 'spade' | 'sean' | 'adain'."""

    style_type: str
    norm_nc: int
    label_nc: int
    hidden_nc: int
    embed_nc: Optional[int] = None
    style_distill: bool = False
    dtype: Dtype = jnp.float32
    use_pallas: bool = True

    @nn.compact
    def __call__(self, x, labels, style_feat=None, *,
                 track_stats=False, inference_stats=False, distill=False):
        if self.style_type == "spade":
            return SPADE(self.norm_nc, self.label_nc, self.hidden_nc,
                         dtype=self.dtype, name="spade")(x, labels)
        if self.style_type == "sean":
            assert self.embed_nc is not None, "embed_nc must be specified for SEAN"
            return SEAN(self.embed_nc, self.norm_nc, self.label_nc,
                        self.hidden_nc, style_distill=self.style_distill,
                        dtype=self.dtype, use_pallas=self.use_pallas,
                        name="sean")(
                x, labels, style_feat, track_stats=track_stats,
                inference_stats=inference_stats, distill=distill)
        if self.style_type == "adain":
            return AdaIN(self.norm_nc, self.hidden_nc, dtype=self.dtype,
                         use_pallas=self.use_pallas,
                         name="adain")(x, style_feat)
        raise ValueError(f"Unknown style norm block type: {self.style_type}")


class NormConvBlock(nn.Module):
    """(2x upsample) -> style-norm -> act -> conv -> noise
    (architecture.py:179-257)."""

    style_type: str
    features: int
    label_nc: int
    hidden_nc: int
    embed_nc: Optional[int] = None
    style_distill: bool = False
    kernel_size: Tuple[int, int] = (3, 3)
    padding: Union[int, str] = "same"
    padding_mode: str = "zeros"
    up_scale: bool = False
    act: Optional[str] = "relu"
    use_spectral: bool = False
    add_noise: bool = False
    dtype: Dtype = jnp.float32
    use_pallas: bool = True

    @nn.compact
    def __call__(self, x, labels, style_feat=None, *, train: bool = False,
                 track_stats=False, inference_stats=False, distill=False):
        if self.up_scale:
            x = upsample_nearest(x)
        y = _StyleNorm(self.style_type, x.shape[-1], self.label_nc,
                       self.hidden_nc, self.embed_nc, self.style_distill,
                       dtype=self.dtype, use_pallas=self.use_pallas,
                       name="norm")(
            x, labels, style_feat, track_stats=track_stats,
            inference_stats=inference_stats, distill=distill)
        y = get_act(self.act)(y)
        y = Conv2d(self.features, self.kernel_size, (1, 1), self.padding,
                   self.padding_mode, use_spectral=self.use_spectral,
                   dtype=self.dtype, name="conv")(y, update_sn=train)
        if self.add_noise:
            y = NoiseInjection(name="noise")(y)
        return y


class NormResBlock(nn.Module):
    """Residual block of two style-norm conv branches; style-norm + conv
    shortcut only when up-scaling (architecture.py:260-371)."""

    style_type: str
    features: int
    label_nc: int
    hidden_nc: int
    embed_nc: Optional[int] = None
    style_distill: bool = False
    kernel_size: Tuple[int, int] = (3, 3)
    padding: Union[int, str] = "same"
    padding_mode: str = "zeros"
    up_scale: bool = False
    act: Optional[str] = "relu"
    use_spectral: bool = False
    add_noise: bool = False
    dtype: Dtype = jnp.float32
    use_pallas: bool = True

    @nn.compact
    def __call__(self, x, labels, style_feat=None, *, train: bool = False,
                 track_stats=False, inference_stats=False, distill=False):
        if self.up_scale:
            x = upsample_nearest(x)
        f_in = x.shape[-1]
        f_mid = min(f_in, self.features)
        norm_kw = dict(track_stats=track_stats, inference_stats=inference_stats,
                       distill=distill)

        # shortcut (architecture.py:352-357)
        if self.up_scale:
            s = _StyleNorm(self.style_type, f_in, self.label_nc, self.hidden_nc,
                           self.embed_nc, self.style_distill, dtype=self.dtype,
                           use_pallas=self.use_pallas,
                           name="norm_s")(x, labels, style_feat, **norm_kw)
            s = Conv2d(self.features, self.kernel_size, (1, 1), self.padding,
                       self.padding_mode, use_spectral=self.use_spectral,
                       dtype=self.dtype, name="conv_s")(s, update_sn=train)
        else:
            s = x

        act = get_act(self.act)
        y = _StyleNorm(self.style_type, f_in, self.label_nc, self.hidden_nc,
                       self.embed_nc, self.style_distill, dtype=self.dtype,
                       use_pallas=self.use_pallas,
                       name="norm_0")(x, labels, style_feat, **norm_kw)
        y = Conv2d(f_mid, self.kernel_size, (1, 1), self.padding,
                   self.padding_mode, use_spectral=self.use_spectral,
                   dtype=self.dtype, name="conv_0")(act(y), update_sn=train)
        if self.add_noise:
            y = NoiseInjection(name="noise_0")(y)
        y = _StyleNorm(self.style_type, f_mid, self.label_nc, self.hidden_nc,
                       self.embed_nc, self.style_distill, dtype=self.dtype,
                       use_pallas=self.use_pallas,
                       name="norm_1")(y, labels, style_feat, **norm_kw)
        y = Conv2d(self.features, self.kernel_size, (1, 1), self.padding,
                   self.padding_mode, use_spectral=self.use_spectral,
                   dtype=self.dtype, name="conv_1")(act(y), update_sn=train)
        if self.add_noise:
            y = NoiseInjection(name="noise_1")(y)
        return y + s


class MaskToken(nn.Module):
    """Learnable fill value for MAE-masked patches (architecture.py:392-418).

    masks are (N, H, W, 1) with 1 = keep, 0 = masked.
    """

    mask_token_type: str
    mask_ratio: float
    input_nc: int = 3
    image_size: int = 128

    @nn.compact
    def __call__(self, imgs: jax.Array, masks: jax.Array) -> jax.Array:
        masked = imgs * masks
        t = self.mask_token_type
        zeros = nn.initializers.zeros_init()
        if t == "zero":
            token = jnp.zeros((), imgs.dtype)
        elif t == "mean":
            # per-image channel mean of the *visible* pixels, rescaled by the
            # mask ratio (architecture.py:416-418) — dynamic, not a parameter
            token = (masked.mean(axis=(1, 2)) / self.mask_ratio)[:, None, None, :]
        elif t == "scalar":
            token = self.param("mask_token", zeros, (1, 1, 1, 1), jnp.float32)
        elif t == "vector":
            token = self.param("mask_token", zeros, (1, 1, 1, self.input_nc),
                               jnp.float32)
        elif t == "position":
            token = self.param("mask_token", zeros,
                               (1, self.image_size, self.image_size, 1), jnp.float32)
        elif t == "full":
            token = self.param("mask_token", zeros,
                               (1, self.image_size, self.image_size, self.input_nc),
                               jnp.float32)
        else:
            raise ValueError(f"Unknown mask token type: {t}")
        return masked + jnp.asarray(token, imgs.dtype) * (1.0 - masks)


class EmbedEncoder(nn.Module):
    """Style-embedding MLP (architecture.py:420-431)."""

    hidden_nc: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, feat: jax.Array) -> jax.Array:
        if feat.ndim == 3:
            feat = feat.mean(axis=1)
        y = nn.relu(Dense(self.hidden_nc, dtype=self.dtype, name="fc_0")(feat))
        y = nn.relu(Dense(self.hidden_nc, dtype=self.dtype, name="fc_1")(y))
        return y


class LatentDecoder(nn.Module):
    """Label + noise -> latent style MLP (architecture.py:434-448)."""

    label_nc: int
    hidden_nc: int
    latent_dim: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, labels: jax.Array) -> jax.Array:
        if labels.ndim == 4:
            labels = labels.reshape(labels.shape[0], -1)
        noise_dim = self.latent_dim - self.label_nc
        noise = jax.random.normal(self.make_rng("latent"),
                                  (labels.shape[0], noise_dim), self.dtype)
        latent = jnp.concatenate([labels.astype(self.dtype), noise], axis=1)
        y = nn.relu(Dense(self.hidden_nc // 2, dtype=self.dtype, name="fc_0")(latent))
        y = nn.relu(Dense(self.hidden_nc, dtype=self.dtype, name="fc_1")(y))
        return y
