"""Unit coverage for utils.diffaug and utils.profiling.

DiffAugment semantics follow the reference's differentiable augmentation
(defectGAN/utils/diffaug.py; arXiv 2006.10738): every op must be
shape-preserving, jit-compatible, deterministic under a fixed key, and
value-bounded so gradients flow to both real and fake branches.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from de_i2i_gan_tpu.utils.diffaug import diff_augment

KEY = jax.random.PRNGKey(7)


def _batch(n=4, s=16):
    return jax.random.uniform(KEY, (n, s, s, 3), minval=-1.0, maxval=1.0)


@pytest.mark.parametrize("policy", ["color", "translation", "cutout",
                                    "color,translation,cutout"])
def test_diff_augment_shape_determinism_and_jit(policy):
    x = _batch()
    y1 = diff_augment(KEY, x, policy)
    y2 = diff_augment(KEY, x, policy)
    assert y1.shape == x.shape
    np.testing.assert_allclose(y1, y2)  # keyed: same key -> same aug
    y3 = diff_augment(jax.random.PRNGKey(8), x, policy)
    assert not np.allclose(y1, y3)  # different key -> different aug
    yj = jax.jit(lambda k, a: diff_augment(k, a, policy))(KEY, x)
    np.testing.assert_allclose(yj, y1, rtol=1e-6, atol=1e-6)


def test_diff_augment_empty_policy_identity_and_grads_flow():
    x = _batch()
    np.testing.assert_allclose(diff_augment(KEY, x, ""), x)

    def loss(a):
        return jnp.sum(diff_augment(KEY, a, "color,translation,cutout") ** 2)

    g = jax.grad(loss)(x)
    assert g.shape == x.shape
    assert bool(jnp.isfinite(g).all())
    assert float(jnp.abs(g).sum()) > 0.0  # differentiable through the augs


def test_diff_augment_translation_preserves_pixel_set():
    """Translation shifts with zero padding: every non-zero output pixel
    value must come from the input (no resampling/interpolation)."""
    x = jnp.arange(1, 1 + 2 * 8 * 8 * 3, dtype=jnp.float32
                   ).reshape(2, 8, 8, 3) / 400.0
    y = diff_augment(KEY, x, "translation")
    in_vals = set(np.asarray(x).ravel().tolist()) | {0.0}
    out_vals = set(np.asarray(y).ravel().tolist())
    assert out_vals <= in_vals


def test_step_timer_summary():
    import time

    from de_i2i_gan_tpu.utils.profiling import StepTimer

    t = StepTimer(warmup=1)
    for _ in range(4):
        with t:
            time.sleep(0.01)
    s = t.summary()
    assert s["n"] == 3  # warmup step dropped
    assert s["mean_s"] >= 0.008
    assert set(s) >= {"n", "mean_s", "p50_s", "p95_s"}


def test_trace_context_writes_profile(tmp_path):
    from de_i2i_gan_tpu.utils.profiling import trace

    with trace(str(tmp_path)):
        jnp.ones((8, 8)).sum().block_until_ready()
    # jax profiler lays down plugins/ or *.trace artifacts under the dir
    assert any(tmp_path.rglob("*")), "trace produced no artifacts"
