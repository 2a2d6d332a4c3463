"""MAE pretraining evaluation (reference: defectGAN/test_mae.py): validation
losses + repair-grid dumps from a pretrained checkpoint.

    python -m de_i2i_gan_tpu.cli.test_mae --name mae_exp \
        --dataset_name synthetic --image_size 128
"""
from __future__ import annotations

import sys
from pathlib import Path

import numpy as np


def main(argv=None):
    import jax
    import jax.numpy as jnp
    from de_i2i_gan_tpu.config.options import (
        Options, to_defectgan_config, to_mae_config, to_train_config)
    from de_i2i_gan_tpu.cli.train_defectgan import build_datasets
    from de_i2i_gan_tpu.cli.test_defectgan import _save_image
    from de_i2i_gan_tpu.data.pipeline import DataLoader
    from de_i2i_gan_tpu.data.transforms import EvalTransform
    from de_i2i_gan_tpu.train.checkpoint import load_checkpoint
    from de_i2i_gan_tpu.train.mae_steps import MAESteps

    opt = Options("mae_test").parse(argv)
    cfg = to_defectgan_config(opt)
    mcfg = to_mae_config(opt)
    datasets, clf = build_datasets(opt, "test", EvalTransform(opt.image_size))
    tcfg = to_train_config(opt, clf)

    steps = MAESteps(cfg, mcfg, tcfg)
    state = steps.init_state(jax.random.PRNGKey(opt.seed))
    name = opt.load_model_name or opt.name
    state = load_checkpoint(opt.ckpt_dir, name, opt.which_epoch, state,
                            strict=False)

    loader = DataLoader(datasets["defects"], opt.batch_size, seed=opt.seed)
    results_dir = Path(opt.results_dir) / name
    results_dir.mkdir(parents=True, exist_ok=True)

    sums, n = {}, 0
    rng = jax.random.PRNGKey(opt.seed)
    for imgs, labels, _ in loader:
        rng, k = jax.random.split(rng)
        batch = {"imgs": jnp.asarray(imgs), "labels": jnp.asarray(labels)}
        ev = steps.jit_eval_losses(state, batch, k)
        for key, v in ev.items():
            sums[key] = sums.get(key, 0.0) + float(v)
        n += 1
    print({k: round(v / max(n, 1), 4) for k, v in sums.items()})

    # repair grids: [orig | combined | masked | pred | pred-masked]
    imgs, labels, _ = next(iter(loader))
    grid = steps.repair_grid(state, jnp.asarray(imgs[:4]),
                             jnp.asarray(labels[:4]), rng)
    g = np.asarray(grid)  # (B, 5, H, W, C)
    rows = [np.concatenate(list(g[i]), axis=1) for i in range(g.shape[0])]
    _save_image(np.concatenate(rows, axis=0), results_dir / "repair_grid.png")
    print(f"wrote repair grid to {results_dir}")


if __name__ == "__main__":
    main(sys.argv[1:])
