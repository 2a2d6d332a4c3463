"""Failure-detection (NaN guard) and multi-host helper tests."""
import jax.numpy as jnp
import numpy as np
import pytest

from de_i2i_gan_tpu.utils.guards import NaNGuard, metrics_finite
from de_i2i_gan_tpu.parallel.distributed import initialize, process_shard


def test_metrics_finite():
    assert metrics_finite({"a": jnp.asarray(1.0)})
    assert not metrics_finite({"a": jnp.asarray(float("nan"))})
    assert not metrics_finite({"a": 1.0, "b": float("inf")})


def test_nan_guard_rollback_and_abort():
    guard = NaNGuard(snapshot_every=1, max_strikes=2)
    good = {"w": jnp.ones(3)}
    bad = {"w": jnp.full(3, 7.0)}

    s, ok = guard.update(good, {"loss": 1.0})
    assert ok and s is good

    # a poisoned step rolls back to the snapshot
    s, ok = guard.update(bad, {"loss": float("nan")})
    assert not ok
    np.testing.assert_array_equal(np.asarray(s["w"]), 1.0)
    assert guard.restores == 1

    # recovery resets the strike counter
    s, ok = guard.update(good, {"loss": 0.5})
    assert ok

    # consecutive failures abort
    guard.update(bad, {"loss": float("nan")})
    with pytest.raises(FloatingPointError):
        guard.update(bad, {"loss": float("nan")})


def test_distributed_helpers_single_process():
    initialize()  # no-op without env
    sl = process_shard(10)
    assert sl == slice(0, 10)
