"""FusedProp quality check for the StarGAN v2 solver (VERDICT r2 #7).

The throughput win is committed (fusedprop_sgv2_ab.json: +8.9% adain /
+7.2% sean); this script checks the part that matters for correctness: do
the simultaneous-update semantics (G's gradient sees the PRE-update D)
change the convergence trajectory of the sgv2 losses (R1 + style /
diversity / cycle), where the deviation is least obviously benign?

Method mirrors the pix2pix check (fusedprop_ab.json
quality_check_600_iters_l1_per_100): same seed, same synthetic data stream,
600 iterations alternating vs fused; per-100-iter means of the cycle,
style and D-adv losses are appended into fusedprop_sgv2_ab.json.

Usage: python benchmarks/fusedprop_sgv2_quality.py [--iters 600] [--size 128]
"""
from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def synth_batch(rng, batch, size, latent_dim, num_domains):
    import jax
    import jax.numpy as jnp
    ks = jax.random.split(rng, 6)
    return {
        "x_src": jax.random.uniform(ks[0], (batch, size, size, 3),
                                    minval=-1, maxval=1),
        "y_src": jax.random.randint(ks[1], (batch,), 0, num_domains),
        "y_ref": jax.random.randint(ks[2], (batch,), 0, num_domains),
        "x_ref": jax.random.uniform(ks[3], (batch, size, size, 3),
                                    minval=-1, maxval=1),
        "x_ref2": jax.random.uniform(ks[4], (batch, size, size, 3),
                                     minval=-1, maxval=1),
        "z_ref": jax.random.normal(ks[5], (batch, latent_dim)),
        "z_ref2": jax.random.normal(jax.random.fold_in(ks[5], 1),
                                    (batch, latent_dim)),
        "z_src": jax.random.normal(jax.random.fold_in(ks[5], 2),
                                   (batch, latent_dim)),
    }


def run(fused: bool, iters: int, size: int, batch: int, window: int):
    import jax
    # persistent compile cache (must be set via jax.config; env is ignored)
    from de_i2i_gan_tpu import default_cache_dir
    jax.config.update("jax_compilation_cache_dir", default_cache_dir())
    from de_i2i_gan_tpu.train.solver import StarGANv2Config, StarGANv2Solver

    on_tpu = jax.default_backend() == "tpu"
    cfg = StarGANv2Config(
        img_size=size, num_domains=3, w_hpf=0.0, norm_type="adain",
        batch_size=batch, fused_prop=fused, ds_iter=iters, total_iters=iters,
        compute_dtype="bfloat16" if on_tpu else "float32")
    solver = StarGANv2Solver(cfg)
    state = solver.init_state(jax.random.PRNGKey(0))
    step = jax.jit(solver.train_step, donate_argnums=0)

    track = ("G/ref_cyc", "G/ref_sty", "D/ref_real", "D/ref_reg",
             "G/latent_adv")
    sums = {k: 0.0 for k in track}
    series = {k: [] for k in track}
    pending = []
    t0 = time.perf_counter()
    for i in range(iters):
        batch_i = synth_batch(jax.random.PRNGKey(10_000 + i), batch, size,
                              cfg.latent_dim, 3)
        state, metrics = step(state, batch_i, jax.random.PRNGKey(i))
        pending.append({k: metrics[k] for k in track if k in metrics})
        if (i + 1) % window == 0:
            fetched = jax.device_get(pending)
            pending = []
            for m in fetched:
                for k, v in m.items():
                    sums[k] += float(v)
            for k in track:
                series[k].append(round(sums[k] / window, 4))
                sums[k] = 0.0
            print(f"[{'fused' if fused else 'alt  '}] iter {i + 1}: " +
                  " ".join(f"{k}={series[k][-1]}" for k in track
                           if series[k]), flush=True)
    dt = time.perf_counter() - t0
    return series, round(iters * batch / dt, 2)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=600)
    ap.add_argument("--size", type=int, default=128)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--window", type=int, default=100)
    ap.add_argument("--out", type=Path,
                    default=Path(__file__).parent / "fusedprop_sgv2_ab.json")
    args = ap.parse_args()

    alt, alt_rate = run(False, args.iters, args.size, args.batch, args.window)
    fused, fused_rate = run(True, args.iters, args.size, args.batch,
                            args.window)

    doc = json.loads(args.out.read_text()) if args.out.exists() else {}
    doc["quality_check"] = {
        "note": (f"adain {args.size}^2 batch {args.batch}, same-seed "
                 f"synthetic stream, {args.iters} iters; per-"
                 f"{args.window}-iter loss means, alternating vs FusedProp"),
        "img_s": {"alt": alt_rate, "fused": fused_rate},
        "alt": alt,
        "fused": fused,
    }
    args.out.write_text(json.dumps(doc, indent=2) + "\n")
    print(json.dumps(doc["quality_check"], indent=2))


if __name__ == "__main__":
    main()
