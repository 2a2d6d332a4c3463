"""Metric orchestration during validation / test.

Mirrors /root/reference/defectGAN/metrics/defectgan_metrics.py:10-123
(calculate_metrics_from_model): loop the defect loader, translate background
images to each defect batch's labels, stream the generated images through
InceptionV3, then compute
  * FID against precomputed real statistics (.npz, mu/sigma)
  * Inception Score from the Inception classifier softmax
  * intra-condition LPIPS diversity over generated pairs
  * (optional) per-class mFID against per-class .npy stats

TPU-first: activations accumulate on device in float32 sums; only the final
(D,) / (D, D) moments come to host, instead of the reference's
save-PNGs-then-re-read pipeline (stargan-v2/metrics/eval.py:67-115).
"""
from __future__ import annotations

from pathlib import Path
from typing import Callable, Dict, Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from de_i2i_gan_tpu.metrics.fid import (
    ActivationStats, frechet_distance, inception_score, load_stats_npz)
from de_i2i_gan_tpu.metrics.inception import InceptionV3
from de_i2i_gan_tpu.metrics.lpips import LPIPS, pairwise_lpips


class Evaluator:
    def __init__(self, dims: int = 2048, rng: Optional[jax.Array] = None,
                 inception_variables=None, lpips_variables=None):
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        from de_i2i_gan_tpu.metrics.inception import BLOCK_INDEX_BY_DIM
        self.block = BLOCK_INDEX_BY_DIM[dims]
        self.dims = dims
        self.inception, self.inc_vars = InceptionV3.init_variables(
            rng, output_blocks=(self.block,))
        if inception_variables is not None:
            self.inc_vars = inception_variables
        self.lpips, self.lpips_vars = LPIPS.init_variables(rng)
        if lpips_variables is not None:
            self.lpips_vars = lpips_variables

        self._features = jax.jit(self._features_impl)
        self._lpips_pair = jax.jit(
            lambda a, b: self.lpips.apply(self.lpips_vars, a, b))

    def _features_impl(self, imgs):
        feats = self.inception.apply(self.inc_vars, imgs)[self.block]
        if feats.ndim == 4:
            feats = feats.mean(axis=(1, 2))
        return feats

    # ------------------------------------------------------------- pipeline
    def evaluate_generator(self, generate_fn: Callable,
                           bg_iter: Iterable, df_loader: Iterable,
                           num_imgs: int = 5000,
                           npz_path: Optional[Path] = None,
                           metrics=("fid", "is", "lpips"),
                           num_lpips_images: int = 10) -> Dict[str, float]:
        """generate_fn(bg_imgs, labels) -> generated images in [-1, 1]."""
        stats = ActivationStats(self.dims)
        # no precomputed .npz -> stream real-data statistics from the defect
        # loader alongside the fakes (the reference's
        # compute_statistics_of_path fallback, fid_score.py:237-256)
        real_stats = ActivationStats(self.dims) \
            if ("fid" in metrics and npz_path is None) else None
        probs = []
        lpips_vals = []
        seen = 0
        for df_imgs, df_labels, _ in df_loader:
            if seen >= num_imgs:
                break
            bg_imgs, _, _ = next(bg_iter)
            bg_imgs = bg_imgs[:df_imgs.shape[0]]
            fake = generate_fn(jnp.asarray(bg_imgs), jnp.asarray(df_labels))
            feats = self._features(fake)
            stats.update(np.asarray(feats, np.float32))
            if real_stats is not None:
                real_stats.update(np.asarray(
                    self._features(jnp.asarray(df_imgs)), np.float32))
            seen += fake.shape[0]
            if "lpips" in metrics and len(lpips_vals) < num_lpips_images:
                lpips_vals.append(float(pairwise_lpips(self._lpips_pair, fake)))
            if "is" in metrics:
                # softmax over pooled features as the class posterior proxy
                probs.append(np.asarray(jax.nn.softmax(feats, axis=-1)))

        out: Dict[str, float] = {}
        if "fid" in metrics and stats.n > 1:
            mu, sigma = stats.finalize()
            if npz_path is not None:
                mu_r, sigma_r = load_stats_npz(npz_path)
                out["fid"] = frechet_distance(mu, sigma, mu_r, sigma_r)
            elif real_stats is not None and real_stats.n > 1:
                mu_r, sigma_r = real_stats.finalize()
                out["fid"] = frechet_distance(mu, sigma, mu_r, sigma_r)
        if "is" in metrics and probs:
            m, s = inception_score(np.concatenate(probs, axis=0))
            out["is"] = m
            out["is_std"] = s
        if "lpips" in metrics and lpips_vals:
            out["lpips"] = float(np.mean(lpips_vals))
        return out

    def dataset_statistics(self, loader: Iterable,
                           num_imgs: int = 50000) -> ActivationStats:
        """Real-data activation statistics (for writing the .npz files the
        FID comparisons consume; fid_score.py:237-256)."""
        stats = ActivationStats(self.dims)
        seen = 0
        for imgs, _, _ in loader:
            if seen >= num_imgs:
                break
            feats = self._features(jnp.asarray(imgs))
            stats.update(np.asarray(feats, np.float32))
            seen += imgs.shape[0]
        return stats


def defectgan_generator_fn(steps, cfg, state) -> Callable:
    """Translation closure over a DefectGAN train state for
    ``Evaluator.evaluate_generator`` — background images + one-hot labels ->
    generated defects via the jitted compositional forward, with the
    sean-mode zero style-feature stub (no reference embeds at eval time;
    defectgan_model.py:437-445 evaluates with the running SEAN stats the
    same way). Shared by ``cli/test_defectgan.py`` and the in-training
    ``--val_metrics`` path of ``cli/train_defectgan.py``.
    """
    def fn(bg_imgs, labels):
        feat = None
        if cfg.style_norm_block_type == "sean":
            feat = jnp.zeros((bg_imgs.shape[0], cfg.num_embeds,
                              cfg.embed_nc))
        out, _ = steps.jit_generate(state, bg_imgs, labels, feat)
        return out
    return fn
