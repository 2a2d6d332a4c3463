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
                    help="[pix2pix|defectgan]")
    ap.add_argument("--out", type=Path, default=None)
    args = ap.parse_args()
    if args.out is None:
        args.out = (Path(__file__).parent /
                    f"roofline_{args.workload}_{args.size}.json")

    import jax
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
    state = steps.init_state(jax.random.PRNGKey(0))

    step_fn = steps.train_step if args.workload == "pix2pix" else \
        steps.super_step
    fn = jax.jit(step_fn, donate_argnums=0)
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
    imgs = batch * (1 if args.workload == "pix2pix"
                    else tcfg.num_critics)
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
    args.out.write_text(json.dumps(out, indent=2) + "\n")
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
