"""WGAN training entry point (reference: defectGAN/train_wgan.py).

    python -m de_i2i_gan_tpu.cli.train_wgan --name wgan_exp \
        --dataset_name synthetic --image_size 64 --batch_size 128
"""
from __future__ import annotations

import sys


def main(argv=None):
    from de_i2i_gan_tpu.config.options import (
        Options, to_train_config, to_wgan_config)
    from de_i2i_gan_tpu.data.datasets import find_dataset_using_name
    from de_i2i_gan_tpu.data.pipeline import DataLoader, SuperBatchLoader
    from de_i2i_gan_tpu.data.transforms import TrainTransform
    from de_i2i_gan_tpu.train.trainer import WGanTrainer

    opt = Options("wgan_train").parse(argv)
    cls = find_dataset_using_name(opt.dataset_name)
    if opt.dataset_name == "synthetic":
        dataset = cls(image_size=opt.image_size, label_nc=1, length=1024,
                      data_type="background", seed=opt.seed)
    else:
        dataset = cls(opt.data_dir, opt.dataset_name, "train",
                      transform=TrainTransform(opt.image_size), seed=opt.seed)
    cfg = to_wgan_config(opt)
    tcfg = to_train_config(opt)
    if opt.native_loader:
        from de_i2i_gan_tpu.runtime.native_loader import (
            make_native_super_batch, native_available)
        assert native_available(), "--native_loader needs a C++ toolchain"
        if opt.dataset_name != "synthetic":
            # cache the UNtransformed images; the C++ side owns crop/flip
            dataset = cls(opt.data_dir, opt.dataset_name, "train",
                          transform=None, seed=opt.seed)
        root = opt.native_cache_dir or (
            opt.ckpt_dir / "native_cache" / opt.name)
        loader = make_native_super_batch(dataset, root / "train",
                                         opt.image_size, opt.batch_size,
                                         cfg.num_critics, seed=opt.seed)
    else:
        base_loader = DataLoader(dataset, opt.batch_size, seed=opt.seed)
        loader = SuperBatchLoader(base_loader, cfg.num_critics)

    # multi-chip data parallelism (on by default when >1 device is visible)
    from de_i2i_gan_tpu.parallel.mesh import mesh_from_flag
    mesh = mesh_from_flag(opt.data_parallel, opt.batch_size)
    if mesh is not None:
        print(f"data-parallel over {mesh.devices.size} devices")

    trainer = WGanTrainer(cfg, tcfg, name=opt.name, ckpt_dir=opt.ckpt_dir,
                          log_dir=opt.log_dir, mesh=mesh,
                          iters_per_epoch=len(loader) * cfg.num_critics,
                          num_epochs=opt.num_epochs,
                          continue_training=opt.continue_training,
                          save_latest_freq=opt.save_latest_freq,
                          save_ckpt_freq=opt.save_ckpt_freq, seed=opt.seed)
    trainer.train(loader)


if __name__ == "__main__":
    main(sys.argv[1:])
