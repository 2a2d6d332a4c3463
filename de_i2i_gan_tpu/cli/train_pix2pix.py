"""Paired image-to-image (pix2pix / pix2pixHD-style) training entry point —
the BASELINE.json north-star workload.

Preserves the public pix2pix CLI surface:

    python -m de_i2i_gan_tpu.cli.train_pix2pix \
        --name edges2photos --dataroot ./datasets/edges2photos \
        --load_size 286 --crop_size 256 --lambda_L1 100 \
        --netG resnet --netD multiscale --gan_mode lsgan

`--dataroot synthetic` trains on the procedural paired dataset (no files).
The trainer runs the scan-fused alternating G/D step (`--iters_per_launch`
iterations per device launch) with an EMA generator.
"""
from __future__ import annotations

import sys


class _Subset:
    """First-N view of a paired dataset (--max_dataset_size)."""

    def __init__(self, dataset, n: int):
        self.dataset = dataset
        self._n = min(n, len(dataset))

    def __len__(self):
        return self._n

    def __getitem__(self, index: int):
        return self.dataset[index]


def build_dataset(opt, phase: str):
    from de_i2i_gan_tpu.data.paired import (AlignedDataset,
                                            SyntheticPairedDataset)
    cap = getattr(opt, "max_dataset_size", 0) or 0
    if opt.dataroot is None or str(opt.dataroot) == "synthetic":
        n = 512 if phase == "train" else 64
        return SyntheticPairedDataset(
            image_size=opt.crop_size,
            length=min(n, cap) if cap else n, seed=opt.seed)
    ds = AlignedDataset(opt.dataroot, phase, load_size=opt.load_size,
                        crop_size=opt.crop_size, flip=not opt.no_flip,
                        direction=opt.direction, seed=opt.seed)
    return _Subset(ds, cap) if cap else ds


def main(argv=None):
    from de_i2i_gan_tpu.config.options import (
        Options, to_pix2pix_config, to_train_config)
    from de_i2i_gan_tpu.data.paired import PairedLoader
    from de_i2i_gan_tpu.train.trainer import Pix2PixTrainer

    # multi-host: no-op single-process; on a TPU slice every host runs this
    # same program, joins via jax.distributed, and loads its own data shard
    from de_i2i_gan_tpu.parallel.distributed import initialize
    initialize()

    opt = Options("pix2pix_train").parse(argv)
    cfg = to_pix2pix_config(opt)
    tcfg = to_train_config(opt)

    import jax
    dataset = build_dataset(opt, "train")
    if jax.process_count() > 1:
        # per-host shard BEFORE caching/loading — otherwise every host feeds
        # identical same-seed batches and the global batch duplicates data
        from de_i2i_gan_tpu.data.datasets import shard_for_process
        dataset = shard_for_process(dataset)
    seed = opt.seed + jax.process_index()
    num_d = opt.num_D if opt.netD == "multiscale" else 1
    if opt.native_loader:
        from pathlib import Path

        from de_i2i_gan_tpu.runtime.native_loader import (
            make_paired_native_loader, native_available)
        assert native_available(), "--native_loader needs a C++ toolchain"
        # cache the UNaugmented pairs at load_size; the C++ side owns the
        # shared random-crop + hflip (aug_mode=2) and ships u8 batches.
        raw = build_dataset(opt, "train")
        # mutate the INNER dataset's transform knobs but keep the
        # --max_dataset_size view for caching, so the cache and the epoch
        # length honor the cap (the view is a pass-through otherwise)
        inner = getattr(raw, "dataset", raw)
        if hasattr(inner, "load_size"):  # file-backed: disable host-side aug
            inner.load_size = opt.load_size
            inner.crop_size = opt.load_size
            inner.flip = False
        if jax.process_count() > 1:
            from de_i2i_gan_tpu.data.datasets import shard_for_process
            raw = shard_for_process(raw)
        root = opt.native_cache_dir or (
            opt.ckpt_dir / "native_cache" / opt.name)
        if jax.process_count() > 1:
            # shard-distinct cache path: on a shared filesystem the first
            # host's cache must not be mistaken for every host's shard
            root = Path(root) / f"proc{jax.process_index()}"
        loader = make_paired_native_loader(
            raw, root / "pairs", opt.crop_size, opt.batch_size,
            load_size=opt.load_size, seed=seed,
            iters_per_launch=max(opt.iters_per_launch, 1))
    else:
        loader = PairedLoader(dataset, opt.batch_size, seed=seed,
                              iters_per_launch=max(opt.iters_per_launch, 1))
    print(f"{len(dataset)} paired train images")

    # multi-chip data parallelism (on by default when >1 device is visible)
    from de_i2i_gan_tpu.parallel.mesh import mesh_from_flag
    mesh = mesh_from_flag(opt.data_parallel, opt.batch_size)
    if mesh is not None:
        print(f"data-parallel over {mesh.devices.size} devices")

    trainer = Pix2PixTrainer(
        cfg, tcfg, name=opt.name, ckpt_dir=opt.ckpt_dir, log_dir=opt.log_dir,
        mesh=mesh,
        num_d_scales=num_d, n_layers_d=opt.n_layers_D,
        gan_kind=opt.gan_mode, lambda_l1=opt.lambda_L1,
        lambda_fm=opt.lambda_feat,
        iters_per_epoch=len(loader) * max(opt.iters_per_launch, 1),
        num_epochs=opt.num_epochs, continue_training=opt.continue_training,
        save_latest_freq=opt.save_latest_freq,
        save_ckpt_freq=opt.save_ckpt_freq, save_img_freq=opt.save_img_freq,
        seed=opt.seed, fused_prop=opt.fused_prop)
    trainer.train(loader)
    return trainer


if __name__ == "__main__":
    main()
