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
                   choices=["train", "pretrain", "sample", "eval",
                            "update_stats", "align"])
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
    p.add_argument("--lambda_rec", type=float, default=10.0,
                   help="MAE pretrain reconstruction weight")
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
    p.add_argument("--wing_ckpt", "--wing_path", dest="wing_ckpt",
                   type=Path, default=None)
    p.add_argument("--pretrain_dir", type=Path, default=None,
                   help="warm-start nets from a MAE pretrain checkpoint dir")
    p.add_argument("--pretrain_iter", type=int, default=None)
    p.add_argument("--randcrop_prob", type=float, default=0.5)
    p.add_argument("--num_workers", type=int, default=4,
                   help="host loader threads")
    p.add_argument("--num_val_refs", type=int, default=4)
    p.add_argument("--update_sean_every", type=int, default=1,
                   help="fold SEAN running-style stats every N iters; 1 "
                        "matches the reference (core/solver.py:301 calls "
                        "update_stats() every iteration), larger values "
                        "are a cheaper opt-in cadence")
    p.add_argument("--src_dir", type=Path, default=None,
                   help="sample mode: source image folder (default "
                        "val_img_dir)")
    p.add_argument("--ref_dir", type=Path, default=None,
                   help="sample mode: reference image folder (default "
                        "val_img_dir)")
    p.add_argument("--result_dir", type=Path, default=None,
                   help="sample mode output dir (default sample_dir)")
    p.add_argument("--allow_degraded_losses", action="store_true",
                   help="proceed even when a loss term would silently "
                        "degrade (sean without --vit_path: lambda_sty "
                        "inactive; w_hpf>0 without FAN: cycle reuses source "
                        "masks). Off = hard error")
    p.add_argument("--make_video", action="store_true",
                   help="sample mode: also render the reference-guided "
                        "interpolation video (core/utils.py:394-419 "
                        "video_ref; the reference ships the capability "
                        "behind a commented call, core/solver.py:365-367)")
    p.add_argument("--vit_path", type=str, default=None,
                   help="HF ViT name/local path for the frozen sean-mode "
                        "feature extractor (random init if omitted)")
    p.add_argument("--DiffAugment", type=str, default="")
    p.add_argument("--fused_prop", action="store_true",
                   help="FusedProp joint D+G backward (arxiv 2004.03335; "
                        "simultaneous-update semantics, ~7-9% faster). "
                        "Quality-checked on a 600-iter A/B: every loss "
                        "term's final mean sits inside the alternating "
                        "baseline's own variance band "
                        "(benchmarks/fusedprop_sgv2_ab.json acceptance). "
                        "Opt-in only because the update SEMANTICS differ "
                        "from the reference's alternating schedule")
    p.add_argument("--data_parallel", type=str, default="auto",
                   choices=["auto", "on", "off"],
                   help="shard the batch over all devices (params "
                        "replicated, GSPMD grad all-reduce over ICI) — the "
                        "TPU-native equivalent of the reference's "
                        "nn.DataParallel wrap of every net "
                        "(core/model.py:694-731). 'auto' enables it when >1 "
                        "device is visible and batch_size divides evenly")
    p.add_argument("--compute_dtype", type=str, default="bfloat16")
    # MAE pretrain mode (main.py:171-175)
    p.add_argument("--patch_size", type=int, default=32)
    p.add_argument("--mask_ratio", type=float, default=0.65)
    p.add_argument("--mask_token_type", type=str, default="position")
    # update_stats mode: tracked styles required per domain (solver.py:391)
    p.add_argument("--num_stats_samples", type=int, default=10000)
    # align mode (main.py:143-145 -> core/wing.py align_faces)
    p.add_argument("--inp_dir", type=Path, default=None)
    p.add_argument("--out_dir", type=Path, default=None)
    p.add_argument("--lm_path", type=Path, default=None,
                   help="CelebA mean-landmarks file for FaceAligner")
    return p


def _make_train_fetcher(args, img_dir, tf, solver=None):
    """Source + reference fetcher; sean mode additionally wraps it with the
    frozen-ViT style-embedding attacher (SEANInputFetcher) and, when a real
    ViT is given, embeds it into the jitted G loss via set_frozen_nets."""
    import jax
    import jax.numpy as jnp
    from de_i2i_gan_tpu.data.starganv2_data import (
        BalancedLoader, ImageFolderDataset, InputFetcher,
        RandomReferenceDataset, ReferenceDataset, SEANInputFetcher,
        make_reference_loader)

    src = BalancedLoader(ImageFolderDataset(img_dir, tf, args.seed),
                         args.batch_size, seed=args.seed,
                         num_threads=args.num_workers)
    ref = make_reference_loader(ReferenceDataset(img_dir, tf, args.seed),
                                args.batch_size, seed=args.seed + 1,
                                num_threads=args.num_workers)
    fetcher = InputFetcher(src, ref, args.latent_dim, args.norm_type,
                           args.hidden_nc, args.seed)
    if args.norm_type != "sean":
        return fetcher
    from de_i2i_gan_tpu.models.vit import (FeatureExtractor, ViTEncoder,
                                           load_hf_vit_weights)
    net = ViTEncoder()
    variables = net.init(jax.random.PRNGKey(0),
                         jnp.zeros((1, 224, 224, 3), jnp.float32))
    if args.vit_path:
        variables = load_hf_vit_weights(args.vit_path, variables)
        if solver is not None:
            # sean style-reconstruction loss embeds x_fake through the same
            # frozen ViT in-graph (reference solver.py:515). Only with real
            # weights: a random ViT adds a large compile/step cost for a
            # meaningless loss term (the warn-once below covers that case).
            solver.set_frozen_nets(vit_variables=variables)
    else:
        import logging
        logging.getLogger(__name__).warning(
            "sean mode without --vit_path: style embeddings come from a "
            "randomly initialized ViT (shapes/flow exercised, styles "
            "not semantic) and lambda_sty is inactive")
    extractor = FeatureExtractor(variables)
    from de_i2i_gan_tpu.models.vit import SIZES
    vit_dim = SIZES[net.model_size]["hidden"]
    if args.embed_nc != vit_dim:
        if args.vit_path:
            raise SystemExit(
                f"--embed_nc {args.embed_nc} must match the frozen ViT's "
                f"hidden width ({vit_dim}) when --vit_path is given")

        # random-ViT flow-exercise mode (warn above): adapt the embedding
        # width so reduced --embed_nc configs (tests, small sweeps) run
        class _Sliced:
            def __init__(self, base, dim):
                self.base, self.dim = base, dim

            def extract(self, x_ref, num_embeds, rng=None):
                e = self.base.extract(x_ref, num_embeds, rng)
                assert self.dim <= e.shape[-1], \
                    f"--embed_nc {self.dim} > ViT width {e.shape[-1]}"
                return e[..., :self.dim]

        extractor = _Sliced(extractor, args.embed_nc)
    style = BalancedLoader(
        RandomReferenceDataset(img_dir, args.num_embeds, tf, args.seed),
        args.batch_size, seed=args.seed + 2)
    return SEANInputFetcher(fetcher, style, extractor, args.num_embeds,
                            args.seed)


def main(argv=None):
    import jax

    from de_i2i_gan_tpu import enable_compile_cache
    enable_compile_cache()
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
        lambda_rec=args.lambda_rec,
        ds_iter=args.ds_iter, total_iters=args.total_iters,
        batch_size=args.batch_size, lr=args.lr, f_lr=args.f_lr,
        beta1=args.beta1, beta2=args.beta2, weight_decay=args.weight_decay,
        num_embeds=args.num_embeds, diff_aug=args.DiffAugment,
        fused_prop=args.fused_prop,
        allow_degraded_losses=args.allow_degraded_losses,
        compute_dtype=args.compute_dtype)

    if args.mode == "align":
        # offline face alignment (main.py:143-145 -> core/wing.py:407-431):
        # no GAN state needed, just the frozen FAN + mean landmarks
        return _align_faces(args)

    solver = StarGANv2Solver(cfg)
    if args.mode == "pretrain":
        # MAE repair pretraining (main.py:76-112, solver.py:98-204): the
        # mask token joins the G param tree/optimizer
        state = solver.init_pretrain_state(
            jax.random.PRNGKey(args.seed), mask_ratio=args.mask_ratio,
            patch_size=args.patch_size,
            mask_token_type=args.mask_token_type)
    else:
        state = solver.init_state(jax.random.PRNGKey(args.seed))
    ckpt_dir = args.checkpoint_dir
    if args.resume_iter > 0:
        state = load_checkpoint(ckpt_dir, "starganv2",
                                f"{args.resume_iter:06d}", state,
                                strict=(args.mode != "update_stats"))

    if args.mode == "train":
        if args.pretrain_dir is not None:
            # MAE warm start (solver.py:57-69,236-240): key-filtered load of
            # the pretrain nets into the fresh train state
            tag = (f"{args.pretrain_iter:06d}" if args.pretrain_iter
                   else "latest")
            state = load_checkpoint(args.pretrain_dir, "starganv2_pretrain",
                                    tag, state, strict=False)
        tf = TrainTransform(args.img_size, jitter=False, vflip=False,
                            randcrop_prob=args.randcrop_prob)
        fetcher = _make_train_fetcher(args, args.train_img_dir, tf, solver)

        # fixed val inputs for the periodic in-training debug grids
        # (core/solver.py:228-229,327-330: inputs_val = next(fetcher_val),
        # debug_image every sample_every). sean mode reuses the train
        # fetcher's batch — it carries the frozen-ViT s_ref stacks a second
        # val-side fetcher would need a duplicate ViT to produce.
        from de_i2i_gan_tpu.utils.translate import debug_image
        inputs_val = None
        if args.norm_type == "sean":
            inputs_val = next(fetcher)
        elif Path(args.val_img_dir).is_dir():
            from de_i2i_gan_tpu.data.transforms import EvalTransform
            val_tf = EvalTransform(args.img_size)
            val_src = BalancedLoader(
                ImageFolderDataset(args.val_img_dir, val_tf, args.seed),
                args.val_batch_size, seed=args.seed)
            val_ref = make_reference_loader(
                ReferenceDataset(args.val_img_dir, val_tf, args.seed),
                args.val_batch_size, seed=args.seed + 1)
            inputs_val = next(InputFetcher(val_src, val_ref, args.latent_dim,
                                           args.norm_type, args.hidden_nc,
                                           args.seed))
        else:
            inputs_val = next(fetcher)

        # multi-chip data parallelism — the TPU-native equivalent of the
        # reference's nn.DataParallel wrap of every net
        # (core/model.py:694-731): batch sharded over a 1-D 'data' mesh,
        # all net/opt/EMA state replicated, GSPMD grad all-reduce over ICI
        from de_i2i_gan_tpu.parallel.mesh import (
            batch_sharding, make_parallel_step, mesh_from_flag, put_batch,
            put_replicated)
        mesh = mesh_from_flag(args.data_parallel, args.batch_size)
        if mesh is not None:
            print(f"data-parallel over {mesh.devices.size} devices")
            # frozen-ViT/FAN params ride as replicated jit args (never
            # inlined constants, never batch-sharded)
            step_fn = make_parallel_step(solver.train_step, mesh,
                                         frozen=solver.frozen_args())
            state = put_replicated(state, mesh)
            data_sh = batch_sharding(mesh)
        else:
            step_fn = solver.jit_train_step

        rng = jax.random.PRNGKey(args.seed)
        running = defaultdict(float)
        for i in range(args.resume_iter, args.total_iters):
            batch = next(fetcher)
            if mesh is not None:
                batch = put_batch(batch, data_sh)
            rng, key = jax.random.split(rng)
            state, metrics = step_fn(state, batch, key)
            if cfg.norm_type == "sean" and \
                    (i + 1) % max(args.update_sean_every, 1) == 0:
                state = solver.update_sean_stats(state)
            for k, v in metrics.items():
                running[k] += float(v)
            if (i + 1) % args.print_every == 0:
                log = " ".join(f"{k}: [{running[k] / args.print_every:.4f}]"
                               for k in sorted(running))
                print(f"Iteration [{i + 1}/{args.total_iters}] {log}")
                running.clear()
            # periodic sample dump (core/solver.py:321-324)
            if (i + 1) % args.sample_every == 0:
                debug_image(solver, state, inputs_val, i + 1,
                            args.sample_dir)
            if (i + 1) % args.save_every == 0:
                save_checkpoint(ckpt_dir, "starganv2", f"{i + 1:06d}", state)
            # in-training metric eval (core/solver.py:346-349)
            if (i + 1) % args.eval_every == 0:
                from de_i2i_gan_tpu.metrics.eval_starganv2 import (
                    evaluate_all_tasks)
                evaluate_all_tasks(solver, state, args, step=i + 1)
        save_checkpoint(ckpt_dir, "starganv2", "latest", state)
    elif args.mode == "sample":
        # reference-guided + cycle sample grids (stargan-v2 utils.py:110-174)
        from de_i2i_gan_tpu.data.transforms import EvalTransform
        from de_i2i_gan_tpu.utils.translate import (
            debug_image, translate_using_latent)
        import jax.numpy as jnp
        tf = EvalTransform(args.img_size)
        src_root = args.src_dir or args.val_img_dir
        ref_root = args.ref_dir or args.val_img_dir
        if args.result_dir is not None:
            args.sample_dir = args.result_dir
        src = BalancedLoader(ImageFolderDataset(src_root, tf, args.seed),
                             args.val_batch_size, seed=args.seed)
        ref = make_reference_loader(
            ReferenceDataset(ref_root, tf, args.seed),
            args.val_batch_size, seed=args.seed + 1)
        fetcher = InputFetcher(src, ref, args.latent_dim, args.norm_type,
                               args.hidden_nc, args.seed)
        inputs = next(fetcher)
        debug_image(solver, state, inputs, args.resume_iter, args.sample_dir)
        if args.make_video:
            if args.norm_type == "sean" and "s_ref" not in inputs:
                print("[sample] --make_video skipped: sean mode needs "
                      "s_ref embed stacks (run with a sean fetcher)")
            else:
                from de_i2i_gan_tpu.utils.translate import video_ref
                # sort refs by domain so same-domain consecutive pairs
                # exist (video_ref only transitions within a domain,
                # core/utils.py:402-407)
                order = np.argsort(np.asarray(inputs["y_ref"]),
                                   kind="stable")[:4]
                out = video_ref(
                    solver, state, jnp.asarray(inputs["x_src"][:2]),
                    jnp.asarray(inputs["x_ref"])[order],
                    np.asarray(inputs["y_ref"])[order],
                    Path(args.sample_dir) / "video_ref.mp4",
                    s_ref=(jnp.asarray(inputs["s_ref"])[order]
                           if "s_ref" in inputs else None))
                print(f"video_ref -> {out}")
        if args.norm_type == "adain":
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
    elif args.mode == "pretrain":
        tf = TrainTransform(args.img_size, jitter=False, vflip=False)
        fetcher = _make_train_fetcher(args, args.train_img_dir, tf, solver)
        from de_i2i_gan_tpu.parallel.mesh import (
            batch_sharding, make_parallel_step, mesh_from_flag, put_batch,
            put_replicated)
        mesh = mesh_from_flag(args.data_parallel, args.batch_size)
        if mesh is not None:
            print(f"data-parallel over {mesh.devices.size} devices")
            step_fn = make_parallel_step(solver.pretrain_step, mesh,
                                         frozen=solver.frozen_args())
            state = put_replicated(state, mesh)
            data_sh = batch_sharding(mesh)
        else:
            step_fn = solver.jit_pretrain_step
        rng = jax.random.PRNGKey(args.seed)
        running = defaultdict(float)
        for i in range(args.resume_iter, args.total_iters):
            batch = next(fetcher)
            if mesh is not None:
                batch = put_batch(batch, data_sh)
            rng, key = jax.random.split(rng)
            state, metrics = step_fn(state, batch, key)
            for k, v in metrics.items():
                running[k] += float(v)
            if (i + 1) % args.print_every == 0:
                log = " ".join(f"{k}: [{running[k] / args.print_every:.4f}]"
                               for k in sorted(running))
                print(f"Pretrain [{i + 1}/{args.total_iters}] {log}")
                running.clear()
            if (i + 1) % args.save_every == 0:
                save_checkpoint(ckpt_dir, "starganv2_pretrain",
                                f"{i + 1:06d}", state)
        save_checkpoint(ckpt_dir, "starganv2_pretrain", "latest", state)
    elif args.mode == "update_stats":
        # sweep the EMA generator with track_running_stats until every
        # domain has >= num_stats_samples tracked styles (solver.py:379-406)
        assert args.norm_type == "sean", "Only SEAN needs to update stats"
        tf = TrainTransform(args.img_size, jitter=False, vflip=False)
        fetcher = _make_train_fetcher(args, args.val_img_dir, tf)
        counts = np.zeros(args.num_domains, np.int64)
        while counts.min() < args.num_stats_samples:
            batch = next(fetcher)
            state = solver.jit_track_stats_step(
                state, batch["x_src"], batch["s_ref"], batch["y_ref"],
                batch.get("masks"))
            np.add.at(counts, np.asarray(batch["y_ref"]), 1)
            print(dict(enumerate(counts.tolist())))
        state = solver.finalize_ema_stats(state)
        save_checkpoint(ckpt_dir, "starganv2", "stats_updated", state)
        print(f"running styles updated; checkpoint saved under {ckpt_dir}")


def _align_faces(args):
    """main.py:143-145 / core/wing.py:407-431: resize -> FAN landmarks ->
    similarity warp to the CelebA mean landmarks -> save."""
    import jax
    from PIL import Image
    from de_i2i_gan_tpu.models.wing import (FAN, FaceAligner, WingHeatmapper,
                                            load_torch_wing_weights)

    assert args.inp_dir and args.out_dir and args.lm_path, \
        "--inp_dir/--out_dir/--lm_path required for align"
    fan = FAN()
    variables = fan.init(jax.random.PRNGKey(0),
                         np.zeros((1, 256, 256, 3), np.float32))
    if args.wing_ckpt is not None:
        variables = load_torch_wing_weights(str(args.wing_ckpt), variables)
    hm = WingHeatmapper(variables, img_size=args.img_size)
    aligner = FaceAligner(hm, str(args.lm_path), args.img_size)

    out_dir = Path(args.out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    fnames = sorted(p for p in Path(args.inp_dir).iterdir()
                    if p.suffix.lower() in (".png", ".jpg", ".jpeg"))
    for fname in fnames:
        img = Image.open(fname).convert("RGB").resize(
            (args.img_size, args.img_size), Image.BILINEAR)
        x = np.asarray(img, np.float32)[None] / 127.5 - 1.0
        aligned = aligner.align(x)[0]
        arr = np.clip((aligned + 1) * 127.5, 0, 255).astype(np.uint8)
        Image.fromarray(arr).save(out_dir / fname.name)
    print(f"aligned {len(fnames)} images -> {out_dir}")


if __name__ == "__main__":
    main(sys.argv[1:])
