"""Conditional normalization: SPADE / AdaIN / SEAN.

Reference semantics: /root/reference/defectGAN/models/networks/normalization.py
  * SPADE  (:10-37): param-free base norm, segmap -> shared 3x3 conv -> per-pixel
    gamma/beta; out = normalized * (1 + gamma) + beta
  * AdaIN  (:40-73): style vector -> linear gamma/beta
  * SEAN   (:76-202): frozen-ViT style embedding MLP mixed with a label-latent
    code, per-multilabel running style statistics, inference-time sampling
    ``noise * std * 1.5 + mean``, zero-embedding fallback to the latent code,
    and a KD-style distillation loss.

TPU-native deviations (documented, intentional):
  * SEAN running statistics are fixed-size ``(2**label_nc, hidden_nc)`` arrays
    with scatter-add accumulators instead of unbounded Python lists keyed by
    label tuples (normalization.py:106-125). ``sean_update_stats`` finalizes
    them per epoch.
  * The reference's ``update_stats`` writes mean/std swapped
    (normalization.py:124: ``mean[:], std[:] = new_std, new_mean`` — a bug).
    We store them the right way round.
  * The distillation loss is sowed into the ``distill_loss`` collection and
    added to the generator loss, instead of calling ``.backward()`` inside
    forward (normalization.py:192) which has no functional equivalent.
  * SPADE on a spatially-constant segmap (labels broadcast to every pixel,
    defectgan_model.py:385-392) is evaluated on a tiny 7x7 tile and expanded —
    exact for H,W >= 7 because the two stacked 3x3 zero-padded convs only
    distinguish pixels by distance-to-border clipped at 2.
"""
from __future__ import annotations

from typing import Any, Optional

import numpy as np
import jax
import jax.numpy as jnp
from flax import linen as nn

from de_i2i_gan_tpu.nn.layers import Conv2d, Dense

Dtype = Any


def instance_norm(x: jax.Array, eps: float = 1e-5) -> jax.Array:
    """Param-free instance norm over H, W (torch nn.InstanceNorm2d(affine=False)).

    Statistics use float32 ACCUMULATION (jnp.mean(dtype=f32)) without
    materializing a float32 copy of the activation tensor: for bf16 compute
    the centered tensor stays bf16 (the only precision cost, ~3 mantissa
    bits on x - mean, irrelevant at GAN activation scales), which cut the
    DefectGAN-256 g_step from 165.0 to 159.5 ms on v5e
    (benchmarks/gstep_opt.json, round 5). For float32 inputs this is
    bit-identical to the previous f32-materializing form, so torch-parity
    tests are unaffected. NOTE: a round-3 single-pass bf16 scale/shift
    rewrite LOST 3-6% (moment-recompute traffic, CLAUDE.md); this is the
    two-pass accumulate-dtype variant, which wins.
    """
    mean = jnp.mean(x, axis=(1, 2), keepdims=True, dtype=jnp.float32)
    xc = x - mean.astype(x.dtype)
    var = jnp.mean(jnp.square(xc.astype(jnp.float32)), axis=(1, 2),
                   keepdims=True)
    return xc * jax.lax.rsqrt(var + eps).astype(x.dtype)


def _border_index(n: int) -> np.ndarray:
    """Map positions 0..n-1 to the 7-point tile rows (0,1,2 | 3 | 4,5,6)."""
    i = np.arange(n)
    return np.where(i <= 2, i, np.where(i >= n - 3, 6 - (n - 1 - i), 3))


def _expand_from_tile(tile: jax.Array, h: int, w: int) -> jax.Array:
    """Expand a (N, 7, 7, C) conv-on-constant-input result to (N, H, W, C)."""
    return tile[:, _border_index(h)[:, None], _border_index(w)[None, :], :]


class SPADE(nn.Module):
    """Spatially-adaptive denormalization (normalization.py:10-37)."""

    norm_nc: int
    label_nc: int
    hidden_nc: int = 128
    kernel_size: int = 3
    dtype: Dtype = jnp.float32

    def _mlp(self, seg: jax.Array) -> tuple[jax.Array, jax.Array]:
        ks = (self.kernel_size, self.kernel_size)
        actv = Conv2d(self.hidden_nc, ks, padding="same", use_bias=True,
                      dtype=self.dtype, name="mlp_shared")(seg)
        actv = nn.relu(actv)
        gamma = Conv2d(self.norm_nc, ks, padding="same", use_bias=True,
                       dtype=self.dtype, name="mlp_gamma")(actv)
        beta = Conv2d(self.norm_nc, ks, padding="same", use_bias=True,
                      dtype=self.dtype, name="mlp_beta")(actv)
        return gamma, beta

    @nn.compact
    def __call__(self, x: jax.Array, segmap: jax.Array) -> jax.Array:
        n, h, w, _ = x.shape
        normalized = instance_norm(x)

        if segmap.ndim == 2 and h >= 7 and w >= 7:
            # spatially-constant segmap fast path: evaluate on a 7x7 tile and
            # modulate with the interior value everywhere, then overwrite the
            # exact <=3px border strips — never materializing full-resolution
            # gamma/beta maps (2 fewer full tensors of HBM traffic per call)
            seg = jnp.broadcast_to(segmap[:, None, None, :].astype(self.dtype),
                                   (n, 7, 7, self.label_nc))
            g7, b7 = self._mlp(seg)
            out = normalized * (1.0 + g7[:, 3:4, 3:4]) + b7[:, 3:4, 3:4]

            rows = _border_index(h)
            cols = _border_index(w)

            def strip(sl_h, sl_w, g, b):
                return normalized[:, sl_h, sl_w] * (1.0 + g) + b

            # top / bottom rows (exact cols via the 7-point column map)
            g_top = g7[:, :3][:, :, cols]
            b_top = b7[:, :3][:, :, cols]
            out = out.at[:, :3].set(strip(slice(0, 3), slice(None),
                                          g_top, b_top))
            g_bot = g7[:, 4:][:, :, cols]
            b_bot = b7[:, 4:][:, :, cols]
            out = out.at[:, h - 3:].set(strip(slice(h - 3, h), slice(None),
                                              g_bot, b_bot))
            # left / right columns
            g_l = g7[:, rows][:, :, :3]
            b_l = b7[:, rows][:, :, :3]
            out = out.at[:, :, :3].set(strip(slice(None), slice(0, 3),
                                             g_l, b_l))
            g_r = g7[:, rows][:, :, 4:]
            b_r = b7[:, rows][:, :, 4:]
            out = out.at[:, :, w - 3:].set(strip(slice(None),
                                                 slice(w - 3, w), g_r, b_r))
            return out.astype(x.dtype)

        if segmap.ndim == 2:
            segmap = segmap[:, None, None, :]
        if segmap.shape[1:3] != (h, w):
            segmap = jax.image.resize(
                segmap, (n, h, w, segmap.shape[-1]), method="nearest")
        gamma, beta = self._mlp(segmap.astype(self.dtype))
        out = normalized * (1.0 + gamma) + beta
        return out.astype(x.dtype)


class AdaIN(nn.Module):
    """Adaptive instance norm driven by a style vector (normalization.py:40-73,
    denorm_type='linear' as wired by architecture.py:224-225)."""

    norm_nc: int
    hidden_nc: int = 128
    dtype: Dtype = jnp.float32
    use_pallas: bool = True

    @nn.compact
    def __call__(self, x: jax.Array, style_feat: jax.Array) -> jax.Array:
        n = x.shape[0]
        assert style_feat.shape == (n, self.hidden_nc), (
            f"style feature must be (N, {self.hidden_nc}), got {style_feat.shape}")
        gamma = Dense(self.norm_nc, dtype=self.dtype, name="mlp_gamma")(style_feat)
        beta = Dense(self.norm_nc, dtype=self.dtype, name="mlp_beta")(style_feat)
        from de_i2i_gan_tpu.ops.fused import modulated_instance_norm
        return modulated_instance_norm(x, gamma, beta,
                                       use_pallas=self.use_pallas)


def sean_label_index(labels: jax.Array) -> jax.Array:
    """Map multilabel one-hot rows (N, L) to indices in [0, 2**L).

    Functional replacement for the reference's label-tuple dict keys
    (normalization.py:107-111, utils/util.py:183-186).
    """
    l = labels.shape[-1]
    powers = jnp.asarray(2 ** np.arange(l), jnp.int32)
    return (labels.astype(jnp.int32) * powers).sum(axis=-1)


def _kl_with_logits(p: jax.Array, q: jax.Array, t: float = 4.0) -> jax.Array:
    """KL(softmax(p/t) || softmax(q/t)) * t^2, batch-mean.

    Matches utils/util.py:109-119 (F.kl_div(log_softmax(q/t), log_softmax(p/t),
    log_target=True, reduction='batchmean') == mean_b sum_i p_i (log p_i - log q_i)).
    """
    logp = jax.nn.log_softmax(p / t, axis=1)
    logq = jax.nn.log_softmax(q / t, axis=1)
    kl = jnp.sum(jnp.exp(logp) * (logp - logq), axis=1)
    return jnp.mean(kl) * t * t


class SEAN(nn.Module):
    """Semantic region-adaptive normalization with per-label running styles
    (normalization.py:76-202)."""

    embed_nc: int
    norm_nc: int
    label_nc: int
    hidden_nc: int = 128
    latent_dim: int = 16
    style_distill: bool = False
    dtype: Dtype = jnp.float32
    use_pallas: bool = True

    @nn.compact
    def __call__(self, x: jax.Array, labels: jax.Array,
                 feat: Optional[jax.Array] = None, *,
                 track_stats: bool = False,
                 inference_stats: bool = False,
                 distill: bool = False) -> jax.Array:
        n = x.shape[0]
        c = x.shape[-1]
        assert c == self.norm_nc
        num_combos = 2 ** self.label_nc

        if labels.ndim == 4:
            labels = labels.reshape(n, -1)

        # label -> latent style code (normalization.py:98-99,152)
        latent_code = nn.relu(
            Dense(self.hidden_nc, dtype=self.dtype, name="mlp_latent")(
                labels.astype(self.dtype)))

        # running per-label stats (normalization.py:106-125). mean/std hold the
        # finalized statistics; sum/sumsq/count accumulate between updates.
        mean_s = self.variable("sean_stats", "mean",
                               jnp.zeros, (num_combos, self.hidden_nc), jnp.float32)
        std_s = self.variable("sean_stats", "std",
                              jnp.zeros, (num_combos, self.hidden_nc), jnp.float32)
        sum_s = self.variable("sean_stats", "sum",
                              jnp.zeros, (num_combos, self.hidden_nc), jnp.float32)
        sumsq_s = self.variable("sean_stats", "sumsq",
                                jnp.zeros, (num_combos, self.hidden_nc), jnp.float32)
        count_s = self.variable("sean_stats", "count",
                                jnp.zeros, (num_combos,), jnp.float32)

        if feat is None:
            mix_feat = latent_code
        elif inference_stats:
            # feat is (N, hidden_nc) noise; sample a style from the running
            # per-label statistics (normalization.py:160-166)
            idx = sean_label_index(labels)
            mu = mean_s.value[idx].astype(self.dtype)
            sd = std_s.value[idx].astype(self.dtype)
            mix_feat = feat.astype(self.dtype) * sd * 1.5 + mu
        else:
            # feat is (N, num_embeds, embed_nc) ViT CLS embeddings
            enc_feat = nn.relu(
                Dense(self.hidden_nc, dtype=self.dtype, name="mlp_shared")(
                    feat.astype(self.dtype)))
            mix_feat = enc_feat + latent_code[:, None, :]
            if mix_feat.ndim == 3:
                mix_feat = mix_feat.mean(axis=1)

            if track_stats:
                idx = sean_label_index(labels)
                tracked = jax.lax.stop_gradient(mix_feat.astype(jnp.float32))
                sum_s.value = sum_s.value.at[idx].add(tracked)
                sumsq_s.value = sumsq_s.value.at[idx].add(jnp.square(tracked))
                count_s.value = count_s.value.at[idx].add(1.0)

            # zero-style fallback to the latent code (normalization.py:183-184)
            zero_rows = jnp.all(mix_feat == 0, axis=1, keepdims=True)
            mix_feat = jnp.where(zero_rows, latent_code, mix_feat)

            if self.style_distill and distill:
                mix_labels = jax.lax.stop_gradient(mix_feat)
                d_latent = _kl_with_logits(latent_code.astype(jnp.float32),
                                           mix_labels.astype(jnp.float32))
                d_embed = _kl_with_logits(enc_feat.mean(axis=1).astype(jnp.float32),
                                          mix_labels.astype(jnp.float32))
                self.sow("distill_loss", "latent", d_latent)
                self.sow("distill_loss", "embed", d_embed)

        gamma = Dense(self.norm_nc, dtype=self.dtype, name="mlp_gamma")(mix_feat)
        beta = Dense(self.norm_nc, dtype=self.dtype, name="mlp_beta")(mix_feat)
        from de_i2i_gan_tpu.ops.fused import modulated_instance_norm
        return modulated_instance_norm(x, gamma, beta,
                                       use_pallas=self.use_pallas)


def sean_update_stats(sean_stats, eps: float = 1e-5):
    """Finalize SEAN running statistics (per-epoch), functional equivalent of
    DefectGanGenerator.update_stats -> SEAN.update_stats
    (generator.py:308-311, normalization.py:113-125).

    Labels with no tracked samples keep their previous mean/std. Accumulators
    reset after finalization (epoch-scoped window; the reference instead keeps
    the last 10k raw embeddings).
    """
    def _update(node):
        if not (isinstance(node, dict) and "sumsq" in node):
            return None
        count = node["count"][:, None]
        seen = count > 0
        mean = jnp.where(seen, node["sum"] / jnp.maximum(count, 1.0), node["mean"])
        # unbiased variance, matching torch .var(dim=0) (normalization.py:121)
        var = (node["sumsq"] - jnp.maximum(count, 1.0) * jnp.square(mean)) / \
            jnp.maximum(count - 1.0, 1.0)
        std = jnp.where(seen, jnp.sqrt(jnp.maximum(var, 0.0) + eps), node["std"])
        return {
            "mean": mean, "std": std,
            "sum": jnp.zeros_like(node["sum"]),
            "sumsq": jnp.zeros_like(node["sumsq"]),
            "count": jnp.zeros_like(node["count"]),
        }

    def _walk(node):
        upd = _update(node)
        if upd is not None:
            return upd
        if isinstance(node, dict):
            return {k: _walk(v) for k, v in node.items()}
        return node

    return _walk(sean_stats)
