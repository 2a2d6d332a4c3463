"""StarGAN v2 evaluation harness.

Mirrors /root/reference/stargan-v2/metrics/eval.py:28-168: for every ordered
domain pair src->trg, translate every validation source image
``num_outs_per_domain`` times (latent-guided: z ~ N(0,1) through the mapping
network, or SEAN running-stats sampling with std_weight=2, eval.py:83-95;
reference-guided: styles from validation reference images), compute LPIPS
diversity over the outputs of each input, and FID per task against the real
target-domain statistics. Mean FID/LPIPS across tasks are the headline
numbers (BASELINE.md).

TPU-first: generated images stream through InceptionV3 on device; no PNG
round trip (the reference writes every sample to disk and re-reads it,
eval.py:67-115).
"""
from __future__ import annotations

import json
from pathlib import Path
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from de_i2i_gan_tpu.data.starganv2_data import ImageFolderDataset, list_domains
from de_i2i_gan_tpu.data.pipeline import DataLoader
from de_i2i_gan_tpu.data.transforms import EvalTransform
from de_i2i_gan_tpu.metrics.evaluator import Evaluator
from de_i2i_gan_tpu.metrics.fid import ActivationStats, frechet_distance
from de_i2i_gan_tpu.metrics.lpips import pairwise_lpips


def evaluate_all_tasks(solver, state, args, evaluator: Optional[Evaluator] = None,
                       mode: str = "latent",
                       step: Optional[int] = None) -> Dict[str, float]:
    ev = evaluator or Evaluator()
    val_root = Path(args.val_img_dir)
    domains = list_domains(val_root)
    tf = EvalTransform(args.img_size)
    results: Dict[str, float] = {}
    rng = jax.random.PRNGKey(args.seed)

    # real per-domain stats
    real_stats = {}
    for d_idx, dom in enumerate(domains):
        ds = ImageFolderDataset(val_root, tf, args.seed)
        only = [s for s in ds.samples if s[1] == d_idx]
        ds.samples = only
        st = ev.dataset_statistics(DataLoader(ds, args.val_batch_size,
                                              shuffle=False, drop_last=False))
        real_stats[dom] = st.finalize()

    fids, lpips_vals = [], []
    for trg_idx, trg in enumerate(domains):
        for src_idx, src in enumerate(domains):
            if src_idx == trg_idx:
                continue
            task = f"{src}2{trg}"
            ds = ImageFolderDataset(val_root, tf, args.seed)
            ds.samples = [s for s in ds.samples if s[1] == src_idx]
            loader = DataLoader(ds, args.val_batch_size, shuffle=False,
                                drop_last=False)
            stats = ActivationStats(ev.dims)
            task_lpips = []
            for imgs, _, _ in loader:
                imgs = jnp.asarray(imgs)
                n = imgs.shape[0]
                y_trg = jnp.full((n,), trg_idx, jnp.int32)
                outs = []
                for k in range(args.num_outs_per_domain):
                    rng, kz = jax.random.split(rng)
                    if solver.cfg.norm_type == "adain":
                        z = jax.random.normal(kz, (n, args.latent_dim))
                        s = solver.M.apply(
                            {"params": state.ema_M if mode == "latent"
                             else state.M.params}, z, y_trg)
                        fake = solver.jit_generate(state, imgs, s, y_trg)
                    else:
                        # SEAN latent mode: running-stats sampling with
                        # std_weight 2 (eval.py:83-95)
                        noise = jax.random.normal(
                            kz, (n, solver.cfg.hidden_nc))
                        fake = solver.jit_generate(
                            state, imgs, noise, y_trg,
                            inference_stats=True, std_weight=2.0)
                    outs.append(fake)
                    stats.update(np.asarray(ev._features(fake)))
                # LPIPS diversity across the outputs of each input
                group = jnp.stack(outs, axis=1)  # (N, K, H, W, C)
                for i in range(min(n, 4)):
                    task_lpips.append(float(
                        pairwise_lpips(ev._lpips_pair, group[i])))
            if stats.n > 1:
                mu, sigma = stats.finalize()
                fid = frechet_distance(mu, sigma, *real_stats[trg])
                results[f"FID_{mode}/{task}"] = fid
                fids.append(fid)
            if task_lpips:
                lp = float(np.mean(task_lpips))
                results[f"LPIPS_{mode}/{task}"] = lp
                lpips_vals.append(lp)

    if fids:
        results[f"FID_{mode}/mean"] = float(np.mean(fids))
    if lpips_vals:
        results[f"LPIPS_{mode}/mean"] = float(np.mean(lpips_vals))
    out_dir = Path(getattr(args, "eval_dir", "expr/eval"))
    out_dir.mkdir(parents=True, exist_ok=True)
    # in-training evals are step-tagged like the reference's per-step JSONs
    # (metrics/eval.py:136-137 writes LPIPS_{step}_{mode}.json)
    tag = f"results_{step:06d}_{mode}.json" if step is not None \
        else f"results_{mode}.json"
    (out_dir / tag).write_text(json.dumps(results, indent=1))
    print(results)
    return results
