"""Benchmark: DefectGAN 256x256 alternating G+D training throughput per chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline: the reference publishes no throughput numbers
(BASELINE.md: "not published"); its only wall-clock training datum is the
vendored StarGAN v2 recipe — 100k iterations at batch 8, 256x256, in ~3 days
on one V100 (stargan-v2/README.md:127) ≈ 3.09 images/sec. We use that as the
reference throughput denominator. The north star (BASELINE.json) asks for
>= 3x A100-class img/s/chip at 256^2.
"""
from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp

REFERENCE_IMG_PER_SEC = 3.09  # stargan-v2/README.md:127 (V100, 256^2, batch 8)


def main():
    from de_i2i_gan_tpu.config import DefectGanConfig, TrainConfig
    from de_i2i_gan_tpu.train.steps import DefectGanSteps

    on_tpu = jax.devices()[0].platform == "tpu"
    batch = 8 if on_tpu else 2
    size = 256 if on_tpu else 64

    cfg = DefectGanConfig(
        image_size=size,
        compute_dtype="bfloat16" if on_tpu else "float32",
        fused_g_forward=True,
    )
    tcfg = TrainConfig(batch_size=batch, num_critics=5, lr=(2e-4, 1e-4))
    steps = DefectGanSteps(cfg, tcfg, iters_per_epoch=1000, num_epochs=100)
    state = steps.init_state(jax.random.PRNGKey(0))

    k = jax.random.PRNGKey(1)
    nc = tcfg.num_critics
    batches = {
        "bg": jax.random.uniform(k, (nc, batch, size, size, 3),
                                 minval=-1, maxval=1),
        "df": jax.random.uniform(k, (nc, batch, size, size, 3),
                                 minval=-1, maxval=1),
        "df_labels": jnp.tile(
            jnp.eye(cfg.label_nc)[1][None, None], (nc, batch, 1)),
    }

    step = steps.jit_super_step
    # warm up + compile; sync by fetching a metric VALUE — on the axon TPU
    # tunnel block_until_ready does not round-trip
    state, metrics = step(state, batches, jax.random.PRNGKey(2))
    float(metrics["rec"])

    n_iters = 10 if on_tpu else 2
    t0 = time.perf_counter()
    for i in range(n_iters):
        state, metrics = step(state, batches, jax.random.PRNGKey(3 + i))
    float(metrics["rec"])
    dt = time.perf_counter() - t0

    # one super-step == num_critics reference iterations, each consuming a
    # defect batch (defectgan_trainer.py:96-109)
    imgs = n_iters * nc * batch
    img_per_sec = imgs / dt
    print(json.dumps({
        "metric": f"defectgan_{size}x{size}_train_img_per_sec_per_chip",
        "value": round(img_per_sec, 2),
        "unit": "img/s",
        "vs_baseline": round(img_per_sec / REFERENCE_IMG_PER_SEC, 2),
    }))


if __name__ == "__main__":
    main()
