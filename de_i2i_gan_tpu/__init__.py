"""de-i2i-gan-tpu: a TPU-native (JAX/XLA/Pallas/pjit) image-to-image GAN framework.

A ground-up rebuild of the capabilities of jason2714/de-i2i-gan (DefectGAN,
MAE-GAN pretraining, WGAN, ViT embedding extraction, StarGAN v2 + SEAN) as an
idiomatic TPU framework:

- NHWC tensors, bfloat16 compute / float32 params
- functional networks (flax.linen) with explicit state for spectral-norm power
  iteration, BatchNorm running statistics and SEAN per-label running styles
- a single jitted alternating G/D train step (separate TTUR optimizers, EMA)
- `jax.sharding.Mesh` + data-parallel sharding for multi-chip scale
- Pallas kernels for the bandwidth-bound fused norm/modulation ops

Reference layout map (file:line cites in docstrings point into /root/reference):
    defectGAN/models/networks/*      -> de_i2i_gan_tpu.nn, de_i2i_gan_tpu.models
    defectGAN/models/*_model.py      -> de_i2i_gan_tpu.losses, de_i2i_gan_tpu.models
    defectGAN/trainers/*             -> de_i2i_gan_tpu.train
    defectGAN/options/*              -> de_i2i_gan_tpu.config
    defectGAN/datasets|loaders/*     -> de_i2i_gan_tpu.data
    defectGAN/metrics/*              -> de_i2i_gan_tpu.metrics
    defectGAN/utils/*                -> de_i2i_gan_tpu.utils
    stargan-v2/core/*                -> de_i2i_gan_tpu.models.starganv2, train.solver
"""

__version__ = "0.1.0"


def default_cache_dir(base: str = "/tmp/de_i2i_jax_cache",
                      platform: str | None = None) -> str:
    """Host-fingerprinted compile-cache path.

    XLA:CPU cache entries are AOT executables specialized to the compiling
    host's CPU features; a cache dir inherited from a DIFFERENT host (the
    round snapshot carries /tmp across machines) fails every load with a
    machine-feature mismatch and silently recompiles without re-storing —
    i.e. a poisoned cache that is strictly slower than no cache. Suffixing
    the dir with a CPU-feature fingerprint gives each host its own cache.

    For the CPU backend the fingerprint is additionally boot-scoped:
    measured live, two hosts with IDENTICAL /proc/cpuinfo (model, stepping,
    flags) still disagreed on LLVM-derived AOT machine features
    (+prefer-no-scatter/+prefer-no-gather), so no cpuinfo hash can separate
    them — a boot_id suffix trades one recompile per boot (cheap on CPU)
    for never inheriting a poisoned CPU cache. TPU entries are serialized
    device executables, not host-AOT code, so the TPU dir stays boot-stable
    and 30-min tunnel compiles survive snapshots. ``platform`` defaults to
    the jax_platforms config (set by every CPU-forcing caller before this
    runs); pass it explicitly to avoid importing jax.
    """
    import hashlib

    try:
        keys = ("model name", "model\t", "stepping", "flags")
        lines = []
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith(keys):
                    lines.append(line)
                if line == "\n" and lines:
                    break  # first core only; all cores are identical
        fp = hashlib.sha256("".join(lines).encode()).hexdigest()[:8]
    except OSError:
        fp = "nofp"
    if platform is None:
        try:
            import jax

            platform = (jax.config.jax_platforms or "").split(",")[0] or None
        except Exception:
            platform = None
    if platform == "cpu":
        try:
            with open("/proc/sys/kernel/random/boot_id") as f:
                boot = f.read().strip().replace("-", "")[:8]
        except OSError:
            boot = "noboot"
        return f"{base}_{fp}_cpu{boot}"
    return f"{base}_{fp}"


def enable_compile_cache(path: str | None = None) -> None:
    """Point JAX's persistent compilation cache at a stable on-disk path.

    Every CLI entry point calls this: without it each subprocess of a
    multi-run workflow (cli/sweep.py's 18 train/test invocations, resumed
    trainings, eval jobs) pays the full XLA compile again — tens of minutes
    per program over a remote-compile TPU backend. Must be set via
    jax.config (env vars set after `import jax` are ignored).

    Override the location with DE_I2I_JAX_CACHE; set it empty to disable.
    """
    import os

    if not path:
        path = os.environ.get("DE_I2I_JAX_CACHE")
        if path is None:
            path = default_cache_dir()
    if not path:  # DE_I2I_JAX_CACHE="" disables the cache entirely
        return
    import jax

    jax.config.update("jax_compilation_cache_dir", path)
