"""Roofline probe for the pix2pix 512^2 workload (bench MFU 0.13 — why?).

Compiles the exact train step on the TPU, pulls flops + bytes accessed from
XLA's compiled-program cost analysis, times the launch, and reports achieved
TFLOP/s vs the bf16 peak and achieved GB/s vs the HBM peak. If the bytes/s
number sits near the HBM roof, 0.13 MFU is the roofline for this
conv-then-normalize workload at 512^2, not a scheduling problem.

Usage: python benchmarks/roofline.py [--size 512] [--batch 4]
       python benchmarks/roofline.py --workload defectgan --size 256 \
           --batch 8   # the DefectGAN flagship step
"""
from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

HBM_PEAK = {"TPU v5 lite": 819e9, "TPU v4": 1228e9, "TPU v5p": 2765e9}
FLOP_PEAK = {"TPU v5 lite": 197e12, "TPU v4": 275e12, "TPU v5p": 459e12}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--iters", type=int, default=6)
    ap.add_argument("--workload", type=str, default="pix2pix",
                    help="[pix2pix|defectgan|infer|sgv2_adain|sgv2_sean]")
    ap.add_argument("--out", type=Path, default=None)
    args = ap.parse_args()
    if args.out is None:
        args.out = (Path(__file__).parent /
                    f"roofline_{args.workload}_{args.size}.json")

    import jax
    # persistent compile cache (must be set via jax.config; env is ignored)
    from de_i2i_gan_tpu import default_cache_dir
    jax.config.update("jax_compilation_cache_dir", default_cache_dir())
    import jax.numpy as jnp
    from de_i2i_gan_tpu.config import DefectGanConfig, TrainConfig

    dev = jax.devices()[0]
    size, batch = args.size, args.batch
    k = jax.random.PRNGKey(1)
    if args.workload == "pix2pix":
        from de_i2i_gan_tpu.train.pix2pix_steps import Pix2PixSteps
        cfg = DefectGanConfig(image_size=size, cycle_gan=True,
                              compute_dtype="bfloat16")
        tcfg = TrainConfig(batch_size=batch, lr=(2e-4,), ema_decay=0.999)
        steps = Pix2PixSteps(cfg, tcfg, num_d_scales=2, iters_per_epoch=1000,
                             num_epochs=200)
        batch_t = {"input": jax.random.uniform(k, (batch, size, size, 3),
                                               minval=-1, maxval=1),
                   "target": jax.random.uniform(k, (batch, size, size, 3),
                                                minval=-1, maxval=1)}
    elif args.workload == "infer":
        # generator-only inference (bench's generator_infer_1024, MFU 0.126)
        from de_i2i_gan_tpu.models.generator import DefectGanGenerator
        cfg = DefectGanConfig(image_size=size, compute_dtype="bfloat16")
        gen = DefectGanGenerator(cfg)
        rng = jax.random.PRNGKey(0)
        x = jax.random.uniform(rng, (batch, size, size, 3), minval=-1,
                               maxval=1)
        labels = jnp.zeros((batch, cfg.label_nc)).at[:, 1].set(1.0)
        variables = gen.init({"params": rng, "noise": rng, "latent": rng},
                             x, labels, train=False)

        def infer_fn(variables, x, labels):
            out, _ = gen.apply(variables, x, labels, train=False,
                               rngs={"noise": jax.random.PRNGKey(0)})
            return out, {"m": jnp.mean(out)}

        state, batch_t = variables, {"x": x, "labels": labels}
        steps = None
    elif args.workload.startswith("sgv2"):
        from de_i2i_gan_tpu.train.solver import (StarGANv2Config,
                                                 StarGANv2Solver)
        cfg = StarGANv2Config(img_size=size, num_domains=3, w_hpf=0.0,
                              norm_type=args.workload.split("_")[1],
                              batch_size=batch, compute_dtype="bfloat16",
                              allow_degraded_losses=True)
        steps = StarGANv2Solver(cfg)
        batch_t = {
            "x_src": jax.random.uniform(k, (batch, size, size, 3),
                                        minval=-1, maxval=1),
            "y_src": jnp.arange(batch, dtype=jnp.int32) % 3,
            "y_ref": (jnp.arange(batch, dtype=jnp.int32) + 1) % 3,
            "x_ref": jax.random.uniform(jax.random.PRNGKey(2),
                                        (batch, size, size, 3), minval=-1,
                                        maxval=1),
            "x_ref2": jax.random.uniform(jax.random.PRNGKey(3),
                                         (batch, size, size, 3), minval=-1,
                                         maxval=1),
            "z_ref": jax.random.normal(jax.random.PRNGKey(4),
                                       (batch, cfg.latent_dim)),
            "z_ref2": jax.random.normal(jax.random.PRNGKey(5),
                                        (batch, cfg.latent_dim)),
            "z_src": jax.random.normal(jax.random.PRNGKey(6),
                                       (batch, cfg.latent_dim)),
        }
        if cfg.norm_type == "sean":
            for i, key_ in enumerate(("s_ref", "s_ref2", "s_src")):
                batch_t[key_] = jax.random.normal(
                    jax.random.PRNGKey(7 + i),
                    (batch, cfg.num_embeds, cfg.embed_nc))
    else:
        from de_i2i_gan_tpu.train.steps import DefectGanSteps
        cfg = DefectGanConfig(image_size=size, compute_dtype="bfloat16",
                              fused_g_forward=True)
        tcfg = TrainConfig(batch_size=batch, num_critics=5, lr=(2e-4, 1e-4))
        steps = DefectGanSteps(cfg, tcfg, iters_per_epoch=1000,
                               num_epochs=100)
        nc = tcfg.num_critics
        batch_t = {"bg": jax.random.uniform(k, (nc, batch, size, size, 3),
                                            minval=-1, maxval=1),
                   "df": jax.random.uniform(k, (nc, batch, size, size, 3),
                                            minval=-1, maxval=1),
                   "df_labels": jnp.tile(jnp.eye(cfg.label_nc)[1][None, None],
                                         (nc, batch, 1))}

    if args.workload == "infer":
        def step_fn(state, b, rng):
            return state, infer_fn(state, b["x"], b["labels"])[1]
        donate = ()
    else:
        state = steps.init_state(jax.random.PRNGKey(0))
        if args.workload == "pix2pix":
            step_fn = steps.train_step
        elif args.workload.startswith("sgv2"):
            step_fn = steps.train_step
        else:
            step_fn = steps.super_step
        donate = (0,)
    fn = jax.jit(step_fn, donate_argnums=donate)
    lowered = fn.lower(state, batch_t, jax.random.PRNGKey(2))
    compiled = lowered.compile()
    ca = compiled.cost_analysis()
    ca = ca[0] if isinstance(ca, (list, tuple)) else ca
    flops = float(ca.get("flops", 0))
    byte_keys = {k_: v for k_, v in ca.items() if "bytes" in k_}

    def run_state():
        return jax.tree_util.tree_map(
            lambda x: jnp.copy(x) if hasattr(x, "dtype") else x, state)

    st = run_state()
    st, m = fn(st, batch_t, jax.random.PRNGKey(3))
    float(next(iter(m.values())))
    t0 = time.perf_counter()
    for i in range(args.iters):
        st, m = fn(st, batch_t, jax.random.PRNGKey(4 + i))
    float(next(iter(m.values())))
    dt = (time.perf_counter() - t0) / args.iters

    bytes_acc = float(byte_keys.get("bytes accessed", 0))
    imgs = batch * (5 if args.workload == "defectgan" else 1)
    out = {
        "device": f"{dev.platform}:{dev.device_kind}",
        "workload": args.workload,
        "size": size, "batch": batch,
        "launch_ms": round(dt * 1e3, 2),
        "img_per_sec": round(imgs / dt, 2),
        "flops_per_launch": flops,
        "achieved_tflops": round(flops / dt / 1e12, 2),
        "mfu_nominal": round(flops / dt / FLOP_PEAK.get(dev.device_kind,
                                                        197e12), 4),
        "bytes_accessed_per_launch": bytes_acc,
        "achieved_gbps": round(bytes_acc / dt / 1e9, 1),
        "hbm_frac": round(bytes_acc / dt / HBM_PEAK.get(dev.device_kind,
                                                        819e9), 4),
        "byte_keys": {k_: float(v) for k_, v in byte_keys.items()},
    }
    # keep a hand-written "note" (e.g. a cap argument or optimization-attempt
    # record) across regenerations
    if args.out.exists():
        try:
            prev = json.loads(args.out.read_text())
            if "note" in prev:
                out["note"] = prev["note"]
        except (ValueError, OSError):
            pass
    args.out.write_text(json.dumps(out, indent=2) + "\n")
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
