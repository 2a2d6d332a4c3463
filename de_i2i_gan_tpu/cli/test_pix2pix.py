"""Paired-i2i inference / evaluation entry point (pix2pix test.py analog).

Loads a Pix2PixTrainer checkpoint, translates the test split with the EMA
generator, writes input|fake|target PNG panels under --results_dir, and
reports L1 plus (with --metrics fid) the FID between generated and target
images computed in-memory (no PNG round-trip, unlike
/root/reference/stargan-v2/metrics/eval.py:67-115).

    python -m de_i2i_gan_tpu.cli.test_pix2pix --name edges2photos \
        --dataroot ./datasets/edges2photos --metrics fid
"""
from __future__ import annotations

import json
import sys
from pathlib import Path

import numpy as np


def main(argv=None):
    import jax
    import jax.numpy as jnp
    from de_i2i_gan_tpu.config.options import (
        Options, to_pix2pix_config, to_train_config)
    from de_i2i_gan_tpu.cli.train_pix2pix import build_dataset
    from de_i2i_gan_tpu.data.paired import PairedLoader
    from de_i2i_gan_tpu.train.checkpoint import load_checkpoint
    from de_i2i_gan_tpu.train.pix2pix_steps import Pix2PixSteps

    opt = Options("pix2pix_test").parse(argv, save=False)
    cfg = to_pix2pix_config(opt)
    tcfg = to_train_config(opt)

    num_d = opt.num_D if opt.netD == "multiscale" else 1
    steps = Pix2PixSteps(cfg, tcfg, num_d_scales=num_d,
                         gan_kind=opt.gan_mode, lambda_l1=opt.lambda_L1,
                         lambda_fm=opt.lambda_feat, n_layers_d=opt.n_layers_D)
    state = steps.init_state(jax.random.PRNGKey(opt.seed))
    name = opt.load_model_name or opt.name
    state = load_checkpoint(opt.ckpt_dir, name, opt.which_epoch, state,
                            strict=False)

    dataset = build_dataset(opt, "test")
    loader = PairedLoader(dataset, opt.batch_size, shuffle=False,
                          drop_last=False, seed=opt.seed)
    out_dir = Path(opt.results_dir) / name
    out_dir.mkdir(parents=True, exist_ok=True)

    evaluator = None
    fake_stats = real_stats = None
    if opt.metrics and "fid" in opt.metrics:
        from de_i2i_gan_tpu.metrics.evaluator import Evaluator
        from de_i2i_gan_tpu.metrics.fid import ActivationStats
        evaluator = Evaluator(dims=opt.dims)
        fake_stats = ActivationStats(opt.dims)
        real_stats = ActivationStats(opt.dims)

    l1_sum, n_imgs, idx = 0.0, 0, 0
    from PIL import Image
    for batch in loader:
        x = jnp.asarray(batch["input"])
        y = batch["target"]
        fake = np.asarray(steps.jit_generate(state, x))
        l1_sum += float(np.abs(fake - y).mean()) * fake.shape[0]
        n_imgs += fake.shape[0]
        if evaluator is not None:
            fake_stats.update(np.asarray(
                evaluator._features(jnp.asarray(fake)), np.float32))
            real_stats.update(np.asarray(
                evaluator._features(jnp.asarray(y)), np.float32))
        if opt.save_img or opt.save_img_grid:
            for i in range(fake.shape[0]):
                panel = np.concatenate([batch["input"][i], fake[i], y[i]],
                                       axis=1)
                arr = np.clip((panel + 1) * 127.5, 0, 255).astype(np.uint8)
                Image.fromarray(arr).save(out_dir / f"{idx:05d}.png")
                idx += 1

    results = {"l1": l1_sum / max(n_imgs, 1), "num_images": n_imgs}
    if evaluator is not None and fake_stats.n > 1:
        from de_i2i_gan_tpu.metrics.fid import frechet_distance
        mu_f, sig_f = fake_stats.finalize()
        mu_r, sig_r = real_stats.finalize()
        results["fid"] = frechet_distance(mu_f, sig_f, mu_r, sig_r)
    (out_dir / "results.json").write_text(json.dumps(results, indent=1))
    print(json.dumps(results))
    return 0


if __name__ == "__main__":
    sys.exit(main())
