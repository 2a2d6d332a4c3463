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

# ISA cap for all CPU-backend runs (tests, dryruns, CPU-fallback bench).
# Root-caused live (round 5): at the default/AVX512 ISA this XLA build tags
# CPU AOT cache entries with LLVM tuning pseudo-features
# (+prefer-no-scatter/+prefer-no-gather) that its own loader then rejects —
# "machine feature not supported on the host" — so the persistent cache
# NEVER round-trips across processes, even two identically-flagged processes
# seconds apart on one machine (this is the mismatch round 4 attributed to
# "identical-cpuinfo hosts disagreeing" and worked around with boot-scoped
# dirs). Pinning --xla_cpu_max_isa=AVX2 keeps those pseudo-features out of
# the entry: measured warm load 1.3 s vs 8.7 s cold, zero load errors.
# Codegen quality only affects CPU smoke paths, never TPU numbers.
CPU_MAX_ISA = "AVX2"


def cpu_xla_flags(existing: str = "", devices: int | None = None,
                  opt0: bool | None = None) -> str:
    """Compose an XLA_FLAGS value for a CPU-forcing (sub)process: pins
    --xla_cpu_max_isa (see CPU_MAX_ISA), optionally forces a virtual device
    count (devices=N) and --xla_backend_optimization_level (opt0=True/False
    sets/strips it; None leaves any existing setting), preserving all
    unrelated flags in ``existing``."""
    drop = ["xla_cpu_max_isa"]
    if devices is not None:
        drop.append("host_platform_device_count")
    if opt0 is not None:
        drop.append("backend_optimization_level")
    flags = [f for f in existing.split() if not any(d in f for d in drop)]
    flags.append(f"--xla_cpu_max_isa={CPU_MAX_ISA}")
    if devices is not None:
        flags.append(f"--xla_force_host_platform_device_count={devices}")
    if opt0:
        flags.append("--xla_backend_optimization_level=0")
    return " ".join(flags)


def default_cache_dir(base: str = "/tmp/de_i2i_jax_cache",
                      platform: str | None = None) -> str:
    """Host-fingerprinted compile-cache path.

    XLA:CPU cache entries are AOT executables specialized to the compiling
    host's CPU features; a cache dir whose entries the current process
    cannot load fails every load with a machine-feature mismatch and
    silently recompiles without re-storing — i.e. a poisoned cache that is
    strictly slower than no cache. Suffixing the dir with a CPU-feature
    fingerprint gives each host its own cache.

    For the CPU backend: when the process runs with the CPU_MAX_ISA pin
    (see cpu_xla_flags — every in-repo CPU-forcing path does), entries are
    host-portable across these x86 VMs and the dir is keyed on the ISA pin,
    stable across boots. Without the pin, AOT entries carry LLVM tuning
    pseudo-features the loader rejects even intra-boot (measured round 5),
    so the legacy boot-scoped dir is kept as a safety valve for external
    callers. TPU entries are serialized device executables, not host-AOT
    code, so the TPU dir stays boot-stable and 30-min tunnel compiles
    survive snapshots (but NOT VM reboots, which wipe /tmp). ``platform``
    defaults to the jax_platforms config (set by every CPU-forcing caller
    before this runs); pass it explicitly to avoid importing jax.
    """
    import hashlib
    import os

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
        if f"--xla_cpu_max_isa={CPU_MAX_ISA}" in os.environ.get(
                "XLA_FLAGS", ""):
            return f"{base}_{fp}_cpu{CPU_MAX_ISA.lower()}"
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
