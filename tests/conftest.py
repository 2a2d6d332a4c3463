"""Test configuration: force an 8-device virtual CPU mesh.

This is the fake-backend strategy the reference lacks (SURVEY.md §4): all
multi-device sharding semantics are validated on CPU via
``--xla_force_host_platform_device_count`` without TPU hardware.

Must run before jax is imported anywhere.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

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
