"""DefectGAN training entry point.

Usage mirrors the reference (/root/reference/defectGAN/train_defectgan.py):

    python -m de_i2i_gan_tpu.cli.train_defectgan \
        --name exp --data_dir ./data --dataset_name codebrim \
        --image_size 128 --batch_size 4 --style_norm_block_type spade

Wiring (train_defectgan.py:49-117): train transforms (resize 1.5x ->
random-resized-crop -> flips -> color jitter -> normalize), dual-stream
{defects, background} loaders with the background stream infinite,
iters_per_epoch from the defect loader, trainer dispatch.
`--dataset_name synthetic` trains on the procedural dataset (no files).
"""
from __future__ import annotations

import sys
from pathlib import Path


def build_datasets(opt, phase: str, transform):
    from de_i2i_gan_tpu.data.datasets import find_dataset_using_name
    cls = find_dataset_using_name(opt.dataset_name)
    kw = {}
    if opt.dataset_name == "synthetic":
        return {
            dt: cls(image_size=opt.image_size, label_nc=opt.label_nc,
                    length=512 if phase == "train" else 64, data_type=dt,
                    seed=opt.seed)
            for dt in ("defects", "background")
        }, "bce"
    if opt.dataset_name in ("mtvec", "mvtec"):
        kw["dataset_data_type"] = opt.dataset_data_type
    datasets = {
        dt: cls(opt.data_dir, opt.dataset_name, phase, dt,
                transform=transform, seed=opt.seed, **kw)
        for dt in ("defects", "background")
    }
    return datasets, cls.clf_loss_type


def main(argv=None):
    from de_i2i_gan_tpu.config.options import (
        Options, to_defectgan_config, to_train_config)
    from de_i2i_gan_tpu.data.pipeline import DataLoader, DualStreamLoader
    from de_i2i_gan_tpu.data.transforms import TrainTransform
    from de_i2i_gan_tpu.train.trainer import DefectGanTrainer

    # multi-host: no-op single-process; on a TPU slice every host runs this
    # same program, joins via jax.distributed, and loads its own data shard
    from de_i2i_gan_tpu.parallel.distributed import initialize, is_primary
    initialize()

    opt = Options("defectgan_train").parse(argv)
    transform = TrainTransform(opt.image_size)
    datasets, clf_loss_type = build_datasets(opt, "train", transform)
    import jax
    if jax.process_count() > 1:
        from de_i2i_gan_tpu.data.datasets import shard_for_process
        datasets = {k: shard_for_process(v) for k, v in datasets.items()}
    cfg = to_defectgan_config(opt)
    tcfg = to_train_config(opt, clf_loss_type)

    if opt.native_loader:
        from de_i2i_gan_tpu.runtime.native_loader import (
            make_native_dual_stream, native_available)
        assert native_available(), "--native_loader needs a C++ toolchain"
        # cache the UNtransformed images; the C++ side owns crop/flip and
        # fills contiguous u8 super-batches in place (no host np.stack)
        raw, _ = build_datasets(opt, "train", None)
        if jax.process_count() > 1:
            # per-host shard BEFORE caching, like the python path above —
            # otherwise every host caches and feeds identical data
            from de_i2i_gan_tpu.data.datasets import shard_for_process
            raw = {k: shard_for_process(v) for k, v in raw.items()}
        root = opt.native_cache_dir or (
            opt.ckpt_dir / "native_cache" / opt.name)
        if jax.process_count() > 1:
            # shard-distinct cache path: on a shared filesystem the first
            # host's cache must not be mistaken for every host's shard
            root = Path(root) / f"proc{jax.process_index()}"
        loader = make_native_dual_stream(
            raw["defects"], raw["background"], root, opt.image_size,
            opt.batch_size, tcfg.num_critics, seed=opt.seed)
    else:
        df_loader = DataLoader(datasets["defects"], opt.batch_size,
                               seed=opt.seed)
        bg_loader = DataLoader(datasets["background"], opt.batch_size,
                               seed=opt.seed + 1)
        loader = DualStreamLoader(df_loader, bg_loader, tcfg.num_critics)
    print(f"{len(datasets['defects'])} defect / "
          f"{len(datasets['background'])} background train images")

    embed_bank = None
    if cfg.style_norm_block_type == "sean" and opt.embed_path is not None \
            and cfg.sean_alpha != 0:
        from de_i2i_gan_tpu.data.embeddings import EmbeddingBank
        p = str(opt.embed_path)
        embed_bank = (EmbeddingBank.load(opt.embed_path) if p.endswith(".npz")
                      else EmbeddingBank.from_torch_file(opt.embed_path,
                                                         cfg.label_nc))

    # multi-chip data parallelism (on by default when >1 device is visible;
    # on a multi-host slice the mesh spans every host's chips and each host
    # feeds its own data shard)
    from de_i2i_gan_tpu.parallel.mesh import mesh_from_flag
    mesh = mesh_from_flag(opt.data_parallel, opt.batch_size)
    if mesh is not None and is_primary():
        print(f"data-parallel over {mesh.devices.size} devices")

    trainer = DefectGanTrainer(
        cfg, tcfg, name=opt.name, ckpt_dir=opt.ckpt_dir, log_dir=opt.log_dir,
        mesh=mesh,
        iters_per_epoch=len(loader) * tcfg.num_critics,
        num_epochs=opt.num_epochs,
        continue_training=opt.continue_training,
        load_model_name=opt.load_model_name, which_epoch=opt.which_epoch,
        save_latest_freq=opt.save_latest_freq,
        save_ckpt_freq=opt.save_ckpt_freq, save_img_freq=opt.save_img_freq,
        seed=opt.seed, embed_bank=embed_bank)

    # in-training validation FID/IS/LPIPS every save_ckpt_freq epochs
    # (reference defectgan_trainer.py:32-43 builds Inception+LPIPS when
    # phase == 'val'; :124-136 runs _val_epoch -> calculate_metrics_from_model)
    val_fn = None
    if opt.val_metrics:
        import json as _json

        from de_i2i_gan_tpu.data.pipeline import InfiniteLoader
        from de_i2i_gan_tpu.data.transforms import EvalTransform
        from de_i2i_gan_tpu.metrics.evaluator import (
            Evaluator, defectgan_generator_fn)

        val_sets, _ = build_datasets(opt, "val",
                                     EvalTransform(opt.image_size))
        val_df = DataLoader(val_sets["defects"], opt.batch_size,
                            seed=opt.seed)
        val_bg = InfiniteLoader(DataLoader(val_sets["background"],
                                           opt.batch_size,
                                           seed=opt.seed + 1))
        ev = Evaluator(dims=opt.dims)
        steps = trainer.steps

        def val_fn(state, epoch):
            out = ev.evaluate_generator(
                defectgan_generator_fn(steps, cfg, state),
                val_bg, val_df, num_imgs=opt.num_imgs,
                npz_path=Path(opt.npz_path) if opt.npz_path else None,
                metrics=tuple(opt.val_metrics),
                num_lpips_images=opt.num_lpips_images)
            path = (Path(opt.ckpt_dir) / opt.name /
                    f"val_metrics_{epoch}.json")
            path.parent.mkdir(parents=True, exist_ok=True)
            path.write_text(_json.dumps(out))
            print({k: round(v, 4) for k, v in out.items()},
                  f"at epoch {epoch}")
            return out

    trainer.train(loader, val_fn=val_fn)


if __name__ == "__main__":
    main(sys.argv[1:])
