"""MAE-GAN pretraining entry point (reference: defectGAN/train_mae.py).

    python -m de_i2i_gan_tpu.cli.train_mae --name mae_exp \
        --dataset_name synthetic --image_size 128 --mask_ratio 0.75 \
        --patch_size 8 --mask_token_type position

Trains on the fusion stream (background + defects); the resulting generator
checkpoint warm-starts DefectGAN training via --load_model_name.
"""
from __future__ import annotations

import sys


def main(argv=None):
    from de_i2i_gan_tpu.config.options import (
        Options, to_defectgan_config, to_mae_config, to_train_config)
    from de_i2i_gan_tpu.data.datasets import find_dataset_using_name
    from de_i2i_gan_tpu.data.pipeline import DataLoader, SuperBatchLoader
    from de_i2i_gan_tpu.data.transforms import TrainTransform
    from de_i2i_gan_tpu.train.trainer import MAETrainer

    opt = Options("mae_train").parse(argv)
    cls = find_dataset_using_name(opt.dataset_name)
    if opt.dataset_name == "synthetic":
        dataset = cls(image_size=opt.image_size, label_nc=opt.label_nc,
                      length=512, data_type="fusion", seed=opt.seed)
        clf_loss_type = "bce"
    else:
        kw = {"dataset_data_type": opt.dataset_data_type} \
            if opt.dataset_name in ("mtvec", "mvtec") else {}
        dataset = cls(opt.data_dir, opt.dataset_name, "train", "fusion",
                      transform=TrainTransform(opt.image_size), seed=opt.seed,
                      **kw)
        clf_loss_type = cls.clf_loss_type

    cfg = to_defectgan_config(opt)
    mcfg = to_mae_config(opt)
    tcfg = to_train_config(opt, clf_loss_type)
    if opt.native_loader:
        from de_i2i_gan_tpu.runtime.native_loader import (
            make_native_super_batch, native_available)
        assert native_available(), "--native_loader needs a C++ toolchain"
        if opt.dataset_name == "synthetic":
            raw = dataset
        else:
            # cache the UNtransformed images; the C++ side owns crop/flip
            raw = cls(opt.data_dir, opt.dataset_name, "train", "fusion",
                      transform=None, seed=opt.seed, **kw)
        root = opt.native_cache_dir or (
            opt.ckpt_dir / "native_cache" / opt.name)
        # C++ workers fill contiguous u8 super-batches in place
        loader = make_native_super_batch(raw, root / "fusion",
                                         opt.image_size, opt.batch_size,
                                         tcfg.num_critics, seed=opt.seed)
    else:
        base_loader = DataLoader(dataset, opt.batch_size, seed=opt.seed)
        loader = SuperBatchLoader(base_loader, tcfg.num_critics)

    # multi-chip data parallelism (on by default when >1 device is visible)
    from de_i2i_gan_tpu.parallel.mesh import mesh_from_flag
    mesh = mesh_from_flag(opt.data_parallel, opt.batch_size)
    if mesh is not None:
        print(f"data-parallel over {mesh.devices.size} devices")

    trainer = MAETrainer(cfg, mcfg, tcfg, name=opt.name,
                         ckpt_dir=opt.ckpt_dir, log_dir=opt.log_dir,
                         mesh=mesh,
                         iters_per_epoch=len(loader) * tcfg.num_critics,
                         num_epochs=opt.num_epochs,
                         continue_training=opt.continue_training,
                         save_latest_freq=opt.save_latest_freq,
                         save_ckpt_freq=opt.save_ckpt_freq,
                         save_img_freq=opt.save_img_freq, seed=opt.seed)
    trainer.train(loader)


if __name__ == "__main__":
    main(sys.argv[1:])
