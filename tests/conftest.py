"""Test configuration: force an 8-device virtual CPU mesh.

This is the fake-backend strategy the reference lacks (SURVEY.md §4): all
multi-device sharding semantics are validated on CPU via
``--xla_force_host_platform_device_count`` without TPU hardware.

Must run before jax is imported anywhere.
"""
import os

from de_i2i_gan_tpu import cpu_xla_flags  # lazy package: does not import jax

os.environ["JAX_PLATFORMS"] = "cpu"
# pins --xla_cpu_max_isa (cache entries round-trip; see cpu_xla_flags) and
# forces the 8-device virtual mesh unless a spawning worker already chose a
# device count, preserving any unrelated caller flags
_flags = os.environ.get("XLA_FLAGS", "")
os.environ["XLA_FLAGS"] = cpu_xla_flags(
    _flags,
    devices=None if "host_platform_device_count" in _flags else 8)

# The axon sitecustomize force-registers the tunneled TPU and overrides
# JAX_PLATFORMS; jax.config.update after import wins (verified: without this,
# 'cpu' env still yields backend == tpu).
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# persistent compilation cache: recompiling identical test programs dominates
# wall time on small hosts. Must go through jax.config.update — env vars set
# after `import jax` are never re-read (jax snapshots its config at import).
from de_i2i_gan_tpu import default_cache_dir
jax.config.update("jax_compilation_cache_dir", default_cache_dir())
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(123)
