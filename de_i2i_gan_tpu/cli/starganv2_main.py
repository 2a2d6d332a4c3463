"""StarGAN v2 entry point (reference: stargan-v2/main.py:33-268).

Modes: train | sample | eval, e.g.

    python -m de_i2i_gan_tpu.cli.starganv2_main --mode train \
        --train_img_dir data/afhq/train --val_img_dir data/afhq/val \
        --num_domains 3 --w_hpf 0 --norm_type adain

The w_hpf>0 CelebA-HQ path additionally needs FAN landmark masks
(models.wing); pass --wing_ckpt to enable.
"""
from __future__ import annotations

import argparse
import sys
from collections import defaultdict
from pathlib import Path

import numpy as np


def build_parser():
    p = argparse.ArgumentParser(
        formatter_class=argparse.ArgumentDefaultsHelpFormatter)
    p.add_argument("--mode", type=str, default="train",
                   choices=["train", "sample", "eval"])
    p.add_argument("--img_size", type=int, default=256)
    p.add_argument("--num_domains", type=int, default=2)
    p.add_argument("--latent_dim", type=int, default=16)
    p.add_argument("--hidden_dim", type=int, default=512)
    p.add_argument("--hidden_nc", type=int, default=256)
    p.add_argument("--style_dim", type=int, default=64)
    p.add_argument("--embed_nc", type=int, default=768)
    p.add_argument("--norm_type", type=str, default="adain",
                   choices=["adain", "sean"])
    p.add_argument("--w_hpf", type=float, default=1.0)
    p.add_argument("--max_conv_dim", type=int, default=512)
    p.add_argument("--lambda_reg", type=float, default=1.0)
    p.add_argument("--lambda_cyc", type=float, default=1.0)
    p.add_argument("--lambda_sty", type=float, default=1.0)
    p.add_argument("--lambda_ds", type=float, default=1.0)
    p.add_argument("--ds_iter", type=int, default=100000)
    p.add_argument("--total_iters", type=int, default=100000)
    p.add_argument("--resume_iter", type=int, default=0)
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--val_batch_size", type=int, default=32)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--f_lr", type=float, default=1e-6)
    p.add_argument("--beta1", type=float, default=0.0)
    p.add_argument("--beta2", type=float, default=0.99)
    p.add_argument("--weight_decay", type=float, default=1e-4)
    p.add_argument("--num_embeds", type=int, default=5)
    p.add_argument("--num_outs_per_domain", type=int, default=10)
    p.add_argument("--seed", type=int, default=777)
    p.add_argument("--train_img_dir", type=Path,
                   default=Path("data/celeba_hq/train"))
    p.add_argument("--val_img_dir", type=Path,
                   default=Path("data/celeba_hq/val"))
    p.add_argument("--sample_dir", type=Path, default=Path("expr/samples"))
    p.add_argument("--checkpoint_dir", type=Path,
                   default=Path("expr/checkpoints"))
    p.add_argument("--eval_dir", type=Path, default=Path("expr/eval"))
    p.add_argument("--print_every", type=int, default=10)
    p.add_argument("--sample_every", type=int, default=5000)
    p.add_argument("--save_every", type=int, default=10000)
    p.add_argument("--eval_every", type=int, default=50000)
    p.add_argument("--wing_ckpt", type=Path, default=None)
    p.add_argument("--DiffAugment", type=str, default="")
    p.add_argument("--compute_dtype", type=str, default="bfloat16")
    return p


def main(argv=None):
    import jax
    from de_i2i_gan_tpu.data.starganv2_data import (
        BalancedLoader, ImageFolderDataset, InputFetcher, ReferenceDataset,
        make_reference_loader)
    from de_i2i_gan_tpu.data.transforms import TrainTransform
    from de_i2i_gan_tpu.train.checkpoint import (load_checkpoint,
                                                 save_checkpoint)
    from de_i2i_gan_tpu.train.solver import StarGANv2Config, StarGANv2Solver

    args = build_parser().parse_args(argv)
    cfg = StarGANv2Config(
        img_size=args.img_size, num_domains=args.num_domains,
        latent_dim=args.latent_dim, hidden_nc=args.hidden_nc,
        style_dim=args.style_dim, embed_nc=args.embed_nc,
        norm_type=args.norm_type, w_hpf=args.w_hpf,
        max_conv_dim=args.max_conv_dim,
        lambda_reg=args.lambda_reg, lambda_cyc=args.lambda_cyc,
        lambda_sty=args.lambda_sty, lambda_ds=args.lambda_ds,
        ds_iter=args.ds_iter, total_iters=args.total_iters,
        batch_size=args.batch_size, lr=args.lr, f_lr=args.f_lr,
        beta1=args.beta1, beta2=args.beta2, weight_decay=args.weight_decay,
        num_embeds=args.num_embeds, diff_aug=args.DiffAugment,
        compute_dtype=args.compute_dtype)

    solver = StarGANv2Solver(cfg)
    state = solver.init_state(jax.random.PRNGKey(args.seed))
    ckpt_dir = args.checkpoint_dir
    if args.resume_iter > 0:
        state = load_checkpoint(ckpt_dir, "starganv2",
                                f"{args.resume_iter:06d}", state)

    if args.mode == "train":
        tf = TrainTransform(args.img_size, jitter=False, vflip=False)
        src = BalancedLoader(ImageFolderDataset(args.train_img_dir, tf,
                                                args.seed),
                             args.batch_size, seed=args.seed)
        ref = make_reference_loader(
            ReferenceDataset(args.train_img_dir, tf, args.seed),
            args.batch_size, seed=args.seed + 1)
        fetcher = InputFetcher(src, ref, args.latent_dim, args.norm_type,
                               args.hidden_nc, args.seed)
        rng = jax.random.PRNGKey(args.seed)
        running = defaultdict(float)
        for i in range(args.resume_iter, args.total_iters):
            batch = next(fetcher)
            rng, key = jax.random.split(rng)
            state, metrics = solver.jit_train_step(state, batch, key)
            if cfg.norm_type == "sean":
                state = solver.update_sean_stats(state)
            for k, v in metrics.items():
                running[k] += float(v)
            if (i + 1) % args.print_every == 0:
                log = " ".join(f"{k}: [{running[k] / args.print_every:.4f}]"
                               for k in sorted(running))
                print(f"Iteration [{i + 1}/{args.total_iters}] {log}")
                running.clear()
            if (i + 1) % args.save_every == 0:
                save_checkpoint(ckpt_dir, "starganv2", f"{i + 1:06d}", state)
        save_checkpoint(ckpt_dir, "starganv2", "latest", state)
    elif args.mode == "sample":
        # reference-guided + cycle sample grids (stargan-v2 utils.py:110-174)
        from de_i2i_gan_tpu.data.transforms import EvalTransform
        from de_i2i_gan_tpu.utils.translate import (
            debug_image, translate_using_latent)
        import jax.numpy as jnp
        tf = EvalTransform(args.img_size)
        src = BalancedLoader(ImageFolderDataset(args.val_img_dir, tf,
                                                args.seed),
                             args.val_batch_size, seed=args.seed)
        ref = make_reference_loader(
            ReferenceDataset(args.val_img_dir, tf, args.seed),
            args.val_batch_size, seed=args.seed + 1)
        fetcher = InputFetcher(src, ref, args.latent_dim, args.norm_type,
                               args.hidden_nc, args.seed)
        inputs = next(fetcher)
        debug_image(solver, state, inputs, args.resume_iter, args.sample_dir)
        if args.norm_type == "adain":
            import numpy as np
            z_list = [jnp.asarray(np.random.default_rng(i).standard_normal(
                args.latent_dim).astype(np.float32)) for i in range(3)]
            grid = translate_using_latent(
                solver, state, jnp.asarray(inputs["x_src"][:4]),
                list(range(args.num_domains)), z_list)
            from PIL import Image
            Image.fromarray((np.clip(grid, 0, 1) * 255).astype("uint8")).save(
                Path(args.sample_dir) / "latent_grid.png")
        print(f"samples written to {args.sample_dir}")
    elif args.mode == "eval":
        from de_i2i_gan_tpu.metrics.eval_starganv2 import evaluate_all_tasks
        evaluate_all_tasks(solver, state, args)


if __name__ == "__main__":
    main(sys.argv[1:])
