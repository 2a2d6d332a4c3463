"""Export trained generators to portable StableHLO serving artifacts.

No reference equivalent (the torch repos deploy by unpickling .pth files);
this is the TPU deployment path: ``jax.export`` artifacts with the weights
baked in, a symbolic batch dimension, and optional multi-platform lowering
(``--platforms cpu tpu``: export on a CPU dev box, serve on TPU unchanged).

Examples:
  python -m de_i2i_gan_tpu.cli.export_model --model defectgan \
      --name run1 --ckpt_dir ./checkpoints --load_from_opt_file \
      ./checkpoints/run1/opt.json --out run1.hlo --validate
  python -m de_i2i_gan_tpu.cli.export_model --model starganv2 \
      --checkpoint_dir expr/checkpoints --resume_iter 100000 \
      --out_dir expr/export --validate
"""
from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np


def _validate(exported, path: Path, direct_fn, args, atol: float = 2e-5):
    """Round-trip the serialized artifact and compare to the live forward."""
    import jax

    from de_i2i_gan_tpu.serving import load_exported
    restored = load_exported(path)
    got = jax.tree_util.tree_leaves(restored.call(*args))
    want = jax.tree_util.tree_leaves(direct_fn(*args))
    assert len(got) == len(want)
    for g, w in zip(got, want):
        err = float(np.max(np.abs(np.asarray(g, np.float32) -
                                  np.asarray(w, np.float32))))
        assert err <= atol, f"round-trip mismatch: max abs err {err}"
    print(f"[export] validated round-trip vs live forward "
          f"(batch {args[0].shape[0]})")


def _export_defectgan(argv):
    import jax
    import jax.numpy as jnp

    from de_i2i_gan_tpu.config.options import (
        Options, to_defectgan_config, to_train_config)
    from de_i2i_gan_tpu.serving import (
        export_defectgan_generator, save_exported)
    from de_i2i_gan_tpu.train.checkpoint import load_checkpoint
    from de_i2i_gan_tpu.train.steps import DefectGanSteps

    opt = Options("defectgan_test").parse(argv.rest, save=False)
    cfg = to_defectgan_config(opt)
    steps = DefectGanSteps(cfg, to_train_config(opt, "bce"))
    state = steps.init_state(jax.random.PRNGKey(opt.seed))
    name = opt.load_model_name or opt.name
    state = load_checkpoint(opt.ckpt_dir, name, opt.which_epoch, state,
                            strict=False)

    ex = export_defectgan_generator(steps, state, use_ema=argv.use_ema,
                                    platforms=argv.platforms)
    out = Path(argv.out or f"{name}_generator.hlo")
    save_exported(ex, out)
    print(f"[export] defectgan generator -> {out} "
          f"({out.stat().st_size / 1e6:.1f} MB, "
          f"platforms={list(ex.platforms)})")

    if argv.validate:
        b = 2
        data = jnp.zeros((b, cfg.image_size, cfg.image_size, 3), jnp.float32)
        labels = jnp.eye(cfg.label_nc, dtype=jnp.float32)[
            jnp.arange(b) % cfg.label_nc]
        seed = jnp.uint32(0)
        if cfg.style_norm_block_type == "sean":
            feat = jnp.zeros((b, cfg.num_embeds, cfg.embed_nc), jnp.float32)
            args, direct = (data, labels, feat, seed), (
                lambda d, l, f, s: steps.generate(
                    state, d, l, f, rng=jax.random.PRNGKey(s),
                    use_ema=argv.use_ema))
        else:
            args, direct = (data, labels, seed), (
                lambda d, l, s: steps.generate(
                    state, d, l, None, rng=jax.random.PRNGKey(s),
                    use_ema=argv.use_ema))
        _validate(ex, out, direct, args)
    return 0


def _export_sgv2(argv):
    import jax
    import jax.numpy as jnp

    from de_i2i_gan_tpu.serving import (
        export_sgv2_generator, export_sgv2_mapping,
        export_sgv2_style_encoder, save_exported)
    from de_i2i_gan_tpu.train.checkpoint import load_checkpoint
    from de_i2i_gan_tpu.train.solver import StarGANv2Config, StarGANv2Solver

    a = argv
    cfg = StarGANv2Config(
        img_size=a.img_size, num_domains=a.num_domains,
        latent_dim=a.latent_dim, hidden_nc=a.hidden_nc,
        style_dim=a.style_dim, embed_nc=a.embed_nc, norm_type=a.norm_type,
        w_hpf=0.0, max_conv_dim=a.max_conv_dim,
        allow_degraded_losses=True)
    solver = StarGANv2Solver(cfg)
    state = jax.jit(solver.init_state)(jax.random.PRNGKey(0))
    if a.checkpoint_dir and a.resume_iter > 0:
        state = load_checkpoint(Path(a.checkpoint_dir), "starganv2",
                                f"{a.resume_iter:06d}", state, strict=False)

    out_dir = Path(a.out_dir or "export")
    outs = {"generator": export_sgv2_generator(
        solver, state, platforms=a.platforms)}
    if cfg.norm_type == "adain":
        outs["style_encoder"] = export_sgv2_style_encoder(
            solver, state, platforms=a.platforms)
        outs["mapping"] = export_sgv2_mapping(
            solver, state, platforms=a.platforms)
    for name, ex in outs.items():
        p = save_exported(ex, out_dir / f"{name}.hlo")
        print(f"[export] starganv2 {name} -> {p} "
              f"({p.stat().st_size / 1e6:.1f} MB, "
              f"platforms={list(ex.platforms)})")

    if a.validate:
        b = 2
        x = jnp.zeros((b, cfg.img_size, cfg.img_size, 3), jnp.float32)
        y = jnp.arange(b, dtype=jnp.int32) % cfg.num_domains
        if cfg.norm_type == "sean":
            s = jnp.zeros((b, cfg.num_embeds, cfg.embed_nc), jnp.float32)
        else:
            s = jnp.zeros((b, cfg.style_dim), jnp.float32)
        _validate(outs["generator"], out_dir / "generator.hlo",
                  lambda x_, s_, y_: solver.generate(state, x_, s_, y_),
                  (x, s, y))
    return 0


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--model", choices=("defectgan", "starganv2"),
                   required=True)
    p.add_argument("--platforms", nargs="*", default=None,
                   help="lowering targets, e.g. --platforms cpu tpu "
                        "(default: current backend only)")
    p.add_argument("--validate", action="store_true",
                   help="deserialize the artifact and compare one batch "
                        "against the live forward")
    p.add_argument("--use_ema", action="store_true",
                   help="defectgan: export the EMA generator weights")
    p.add_argument("--out", default=None, help="defectgan artifact path")
    # starganv2 net surface (main.py flag names)
    p.add_argument("--img_size", type=int, default=256)
    p.add_argument("--num_domains", type=int, default=2)
    p.add_argument("--latent_dim", type=int, default=16)
    p.add_argument("--hidden_nc", type=int, default=256)
    p.add_argument("--style_dim", type=int, default=64)
    p.add_argument("--embed_nc", type=int, default=768)
    p.add_argument("--max_conv_dim", type=int, default=512)
    p.add_argument("--norm_type", choices=("adain", "sean"), default="adain")
    p.add_argument("--checkpoint_dir", default=None)
    p.add_argument("--resume_iter", type=int, default=0)
    p.add_argument("--out_dir", default=None)
    args, rest = p.parse_known_args(argv)
    args.rest = rest
    if args.model == "defectgan":
        return _export_defectgan(args)
    return _export_sgv2(args)


if __name__ == "__main__":
    sys.exit(main())
