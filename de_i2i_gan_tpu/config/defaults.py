"""Model / training configuration dataclasses.

These mirror the reference's argparse option surface
(/root/reference/defectGAN/options/defectgan_options.py:8-189 and
options/base_options.py:8-56, options/train_options.py) but are plain frozen
dataclasses so they can be closed over by jitted functions as static config.

The CLI layer (de_i2i_gan_tpu.config.options) parses the same flag names and
fills these in.
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class DefectGanConfig:
    """Architecture hyper-parameters for the DefectGAN generator/discriminator.

    Defaults match /root/reference/defectGAN/options/defectgan_options.py:16-72.
    """

    # input/output (base_options.py:24-27)
    image_size: int = 128
    input_nc: int = 3
    output_nc: int = 3
    label_nc: int = 6

    # generator (defectgan_options.py:29-34)
    ngf: int = 64
    num_scales: int = 2
    num_res: int = 6
    add_noise: bool = False
    style_norm_block_type: str = "spade"  # spade | sean | adain
    hidden_nc: int = 128

    # discriminator (defectgan_options.py:38-39)
    ndf: int = 64
    num_layers: int = 5

    # model switches (defectgan_options.py:42-48)
    init_type: str = "normal"
    init_variance: float = 0.02
    cycle_gan: bool = False
    skip_conn: bool = False
    use_spectral: bool = False

    # SEAN style embeddings (defectgan_options.py:65-72)
    embed_nc: int = 768
    latent_dim: int = 16
    num_embeds: int = 5
    sean_alpha: Optional[float] = None
    style_distill: bool = False
    use_running_stats: bool = False

    # TPU-specific compute policy (no reference equivalent: the reference runs
    # fp32 on GPU, trainers/defectgan_trainer.py:160-161 bypasses AMP).
    compute_dtype: str = "float32"  # "bfloat16" on TPU for speed
    # fused Pallas norm kernel (ops/pallas/norm_kernels.py). Measured on v5e
    # at 256^2 adain training: XLA's own reduce+fuse pipeline is ~4% faster
    # than the kernel (334 vs 347 ms/superstep) because the custom VJP
    # recomputes x_hat; default off for training, available for
    # inference-heavy or very bandwidth-bound shapes.
    use_pallas: bool = False
    # batch the two translation directions of each cycle hop into one 2B
    # generator call (larger MXU tiles, fewer launches). NUMERICALLY
    # IDENTICAL to the reference's 4 separate forwards
    # (defectgan_model.py:185-190): BatchNorm statistics stay per-direction
    # via bn_groups=2 (nn/blocks.py::_apply_norm), proven by
    # tests/test_fused_g_equivalence.py (loss/grad/running-stat equality;
    # only the noise-RNG stream and EMA update order differ). Default ON
    # since the round-5 A/B: +2.5% train throughput at 256^2 b8 on v5e
    # (benchmarks/defectgan_gstep_ab.json).
    fused_g_forward: bool = True
    # rematerialize generator forwards inside the G loss (jax.checkpoint):
    # trades ~1 extra forward of FLOPs for O(1) activation memory per hop,
    # unlocking larger per-chip batches at high resolution.
    remat: bool = False

    @property
    def dtype(self):
        return jnp.dtype(self.compute_dtype)

    def replace(self, **kw) -> "DefectGanConfig":
        return dataclasses.replace(self, **kw)


@dataclasses.dataclass(frozen=True)
class MAEConfig:
    """MAE-GAN pretraining options (defectgan_options.py:144-189)."""

    mask_ratio: float = 0.75
    patch_size: int = 8
    mask_token_type: str = "position"  # zero|mean|scalar|vector|position|full
    split_training: bool = False


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Optimization options (options/train_options.py:5-49 +
    defectgan_options.py:93-110 + trainers/base_trainer.py:68-126)."""

    batch_size: int = 4
    optimizer: str = "adam"  # sgd|rmsprop|adam|adamw
    lr: Tuple[float, ...] = (2e-4,)  # (lr,) or (lr_d, lr_g)  TTUR
    lr_decay: float = 5e-3
    scheduler: str = "step"  # step|exp|cos
    num_epochs: int = -1
    num_iters: int = 500_000
    num_critics: int = 5
    # [clf_d, clf_g, rec, sd_cyc, sd_con] (defectgan_options.py:100-101)
    loss_weight: Tuple[float, ...] = (2.0, 5.0, 5.0, 5.0, 1.0)
    diff_aug: str = ""  # comma-separated DiffAugment policy
    clf_loss_type: str = "bce"  # bce for codebrim multilabel, cce for mvtec
    ema_decay: float = 0.0  # 0 disables; stargan-v2 uses 0.999 (solver.py:549)

    @property
    def lr_d(self) -> float:
        return self.lr[0]

    @property
    def lr_g(self) -> float:
        return self.lr[1] if len(self.lr) > 1 else self.lr[0]


@dataclasses.dataclass(frozen=True)
class WGanConfig:
    """WGAN options (options/wgan_options.py:7-72)."""

    image_size: int = 64
    noise_dim: int = 100
    ngf: int = 64
    ndf: int = 64
    num_layers: int = 3
    clipping_limit: float = 0.03
    num_critics: int = 5
    compute_dtype: str = "float32"

    @property
    def dtype(self):
        return jnp.dtype(self.compute_dtype)
