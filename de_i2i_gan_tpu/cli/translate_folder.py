"""Batched folder inference (BASELINE.json config #5: batched 1024x1024
folder inference with spatial sharding).

Loads a DefectGAN checkpoint, runs the generator over every image in a
folder at its native (power-of-two) resolution — the generator is fully
convolutional — and writes translated PNGs. On a multi-chip mesh the batch is
sharded over 'data' and the image height over 'spatial'
(parallel.mesh.spatial_sharded_inference); GSPMD inserts the conv halo
exchanges.

    python -m de_i2i_gan_tpu.cli.translate_folder --name exp \
        --input_dir imgs/ --output_dir out/ --image_size 1024 \
        --target_label 2 [--spatial 2]
"""
from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np


def main(argv=None):
    import jax
    import jax.numpy as jnp
    from de_i2i_gan_tpu.config import DefectGanConfig, TrainConfig
    from de_i2i_gan_tpu.config.options import Options, to_defectgan_config
    from de_i2i_gan_tpu.data.transforms import EvalTransform
    from de_i2i_gan_tpu.parallel.mesh import (
        make_mesh, replicate, spatial_sharded_inference)
    from de_i2i_gan_tpu.train.checkpoint import load_checkpoint
    from de_i2i_gan_tpu.train.steps import DefectGanSteps

    p = argparse.ArgumentParser()
    p.add_argument("--input_dir", type=Path, required=True)
    p.add_argument("--output_dir", type=Path, required=True)
    p.add_argument("--target_label", type=int, default=1)
    p.add_argument("--spatial", type=int, default=1,
                   help="shard image height over this many chips")
    known, rest = p.parse_known_args(argv)

    opt = Options("defectgan_test").parse(rest, save=False)
    cfg = to_defectgan_config(opt)
    steps = DefectGanSteps(cfg, TrainConfig())
    state = steps.init_state(jax.random.PRNGKey(opt.seed))
    name = opt.load_model_name or opt.name
    state = load_checkpoint(opt.ckpt_dir, name, opt.which_epoch, state,
                            strict=False)

    tf = EvalTransform(opt.image_size)
    rng = np.random.default_rng(opt.seed)
    files = sorted(f for f in known.input_dir.iterdir()
                   if f.suffix.lower() in (".png", ".jpg", ".jpeg"))
    known.output_dir.mkdir(parents=True, exist_ok=True)

    def apply_fn(variables, imgs, labels):
        out, _ = steps.G.apply(variables, imgs, labels, train=False,
                               rngs={"noise": jax.random.PRNGKey(0)})
        return out

    n_dev = opt.num_devices or len(jax.devices())
    variables = {"params": state.G.params, **state.G.state}
    batch_size = max(1, opt.batch_size)
    if known.spatial > 1 and n_dev >= known.spatial:
        mesh = make_mesh(n_dev, spatial=known.spatial)
        # the batch axis shards over 'data': round the launch batch up to a
        # multiple of it (the tail-padding below already fills extra rows)
        n_data = mesh.shape["data"]
        batch_size = -(-batch_size // n_data) * n_data
        fwd = spatial_sharded_inference(apply_fn, mesh)
        variables = jax.device_put(variables, replicate(mesh))
    else:
        fwd = jax.jit(apply_fn)

    from PIL import Image
    labels_row = np.zeros(cfg.label_nc, np.float32)
    labels_row[known.target_label] = 1.0
    done = 0
    for i in range(0, len(files), batch_size):
        chunk = files[i:i + batch_size]
        imgs = np.stack([tf(Image.open(f), rng) for f in chunk])
        # pad the tail batch to keep shapes static under jit
        pad = batch_size - len(chunk)
        if pad:
            imgs = np.concatenate(
                [imgs, np.zeros((pad, *imgs.shape[1:]), imgs.dtype)])
        labels = np.tile(labels_row, (batch_size, 1))
        out = np.asarray(fwd(variables, jnp.asarray(imgs),
                             jnp.asarray(labels)))
        for f, o in zip(chunk, out):
            arr = np.clip((o + 1) * 127.5, 0, 255).astype(np.uint8)
            Image.fromarray(arr).save(known.output_dir / f.name)
            done += 1
    print(f"translated {done} images -> {known.output_dir}")


if __name__ == "__main__":
    main(sys.argv[1:])
