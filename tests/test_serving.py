"""Serving export (de_i2i_gan_tpu/serving.py): jax.export artifacts with a
symbolic batch dim round-trip through serialize/deserialize and match the
live forward for every exported program."""
import dataclasses
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from de_i2i_gan_tpu.config import DefectGanConfig, TrainConfig
from de_i2i_gan_tpu.serving import (
    export_defectgan_generator,
    export_sgv2_generator,
    export_sgv2_mapping,
    export_sgv2_style_encoder,
    load_exported,
    save_exported,
)
from de_i2i_gan_tpu.train.solver import StarGANv2Config, StarGANv2Solver
from de_i2i_gan_tpu.train.state import NetState
from de_i2i_gan_tpu.train.steps import DefectGanSteps

DG_CFG = dict(image_size=32, label_nc=4, ngf=8, ndf=8, num_scales=2,
              num_res=2, hidden_nc=16, num_layers=2)
SG_CFG = StarGANv2Config(img_size=32, num_domains=3, style_dim=8,
                         latent_dim=4, hidden_nc=16, embed_nc=12, w_hpf=0.0,
                         max_conv_dim=32, allow_degraded_losses=True)


def _dg(style="spade"):
    cfg = DefectGanConfig(style_norm_block_type=style, embed_nc=12,
                          **DG_CFG)
    steps = DefectGanSteps(cfg, TrainConfig(batch_size=2))
    state = steps.init_state(jax.random.PRNGKey(0))
    return cfg, steps, state


def _dg_args(cfg, b):
    k = jax.random.PRNGKey(1)
    data = jax.random.uniform(k, (b, cfg.image_size, cfg.image_size, 3),
                              minval=-1, maxval=1)
    labels = jnp.eye(cfg.label_nc)[jnp.arange(b) % cfg.label_nc]
    args = [data, labels]
    if cfg.style_norm_block_type == "sean":
        args.append(jnp.zeros((b, cfg.num_embeds, cfg.embed_nc)))
    args.append(jnp.uint32(7))
    return tuple(args)


@pytest.mark.parametrize("style", ["spade", "sean"])
def test_defectgan_export_roundtrip(style, tmp_path):
    cfg, steps, state = _dg(style)
    ex = export_defectgan_generator(steps, state)
    path = save_exported(ex, tmp_path / "g.hlo")
    restored = load_exported(path)

    # symbolic batch: one artifact serves different batch sizes
    for b in (1, 3):
        args = _dg_args(cfg, b)
        out, prob = restored.call(*args)
        feat = args[2] if style == "sean" else None
        want_out, want_prob = steps.generate(
            state, args[0], args[1], feat,
            rng=jax.random.PRNGKey(args[-1]))
        assert out.shape == (b, cfg.image_size, cfg.image_size, 3)
        np.testing.assert_allclose(np.asarray(out), np.asarray(want_out),
                                   atol=2e-5)
        np.testing.assert_allclose(np.asarray(prob), np.asarray(want_prob),
                                   atol=2e-5)


def test_defectgan_export_seed_input_varies_noise(tmp_path):
    cfg = DefectGanConfig(style_norm_block_type="spade", add_noise=True,
                          **DG_CFG)
    steps = DefectGanSteps(cfg, TrainConfig(batch_size=2))
    state = steps.init_state(jax.random.PRNGKey(0))
    # NoiseInjection weights init to 0 (StyleGAN convention) — crank them up
    # so the traced seed input actually reaches the output
    params = jax.tree_util.tree_map_with_path(
        lambda p, x: jnp.ones_like(x)
        if any(getattr(k, "key", None) == "noise" for k in p) else x,
        state.G.params)
    state = state.replace(G=NetState(params, state.G.state,
                                     state.G.opt_state))
    ex = export_defectgan_generator(steps, state)
    restored = load_exported(save_exported(ex, tmp_path / "g.hlo"))
    data, labels, _ = _dg_args(cfg, 2)
    a, _ = restored.call(data, labels, jnp.uint32(0))
    b, _ = restored.call(data, labels, jnp.uint32(1))
    assert float(np.abs(np.asarray(a) - np.asarray(b)).max()) > 0


def test_sgv2_export_roundtrip(tmp_path):
    solver = StarGANv2Solver(SG_CFG)
    state = jax.jit(solver.init_state)(jax.random.PRNGKey(0))
    g = load_exported(save_exported(
        export_sgv2_generator(solver, state), tmp_path / "g.hlo"))
    se = load_exported(save_exported(
        export_sgv2_style_encoder(solver, state), tmp_path / "s.hlo"))
    mp = load_exported(save_exported(
        export_sgv2_mapping(solver, state), tmp_path / "m.hlo"))

    for b in (1, 2):
        k = jax.random.PRNGKey(b)
        x = jax.random.uniform(k, (b, 32, 32, 3), minval=-1, maxval=1)
        y = jnp.arange(b, dtype=jnp.int32) % 3
        z = jax.random.normal(jax.random.PRNGKey(b + 9), (b, 4))
        s_ref = se.call(x, y)
        np.testing.assert_allclose(
            np.asarray(s_ref),
            np.asarray(solver.S.apply({"params": state.ema_S}, x, y)),
            atol=2e-5)
        s_lat = mp.call(z, y)
        np.testing.assert_allclose(
            np.asarray(s_lat),
            np.asarray(solver.M.apply({"params": state.ema_M}, z, y)),
            atol=2e-5)
        out = g.call(x, s_ref, y)
        want = solver.generate(state, x, s_ref, y)
        np.testing.assert_allclose(np.asarray(out), np.asarray(want),
                                   atol=2e-5)


def test_sgv2_export_refuses_w_hpf():
    cfg = dataclasses.replace(SG_CFG, w_hpf=1.0)
    solver = StarGANv2Solver(cfg)
    state = jax.jit(solver.init_state)(jax.random.PRNGKey(0))
    with pytest.raises(ValueError, match="w_hpf"):
        export_sgv2_generator(solver, state)


def test_export_cli_smoke(tmp_path):
    from de_i2i_gan_tpu.cli.export_model import main
    rc = main(["--model", "starganv2", "--img_size", "32",
               "--num_domains", "3", "--style_dim", "8", "--latent_dim",
               "4", "--hidden_nc", "16", "--embed_nc", "12",
               "--max_conv_dim", "32", "--out_dir", str(tmp_path),
               "--validate"])
    assert rc == 0
    assert (tmp_path / "generator.hlo").exists()
    assert (tmp_path / "style_encoder.hlo").exists()
    assert (tmp_path / "mapping.hlo").exists()


@pytest.mark.slow
def test_exported_artifact_serves_sharded(tmp_path):
    """Multi-chip serving: a deserialized artifact's ``.call`` is an
    ordinary jittable function, so the serving side can jit it over a DP
    mesh with a batch-sharded input — GSPMD partitions the baked-weight
    program like any other. Needs the 8-virtual-device CPU backend
    (tests/conftest.py XLA_FLAGS)."""
    from de_i2i_gan_tpu.parallel.mesh import batch_sharding, make_mesh

    if len(jax.devices()) < 2:
        pytest.skip("needs the multi-device CPU backend")
    solver = StarGANv2Solver(SG_CFG)
    state = jax.jit(solver.init_state)(jax.random.PRNGKey(0))
    g = load_exported(save_exported(
        export_sgv2_generator(solver, state), tmp_path / "g.hlo"))

    mesh = make_mesh()
    n = len(mesh.devices.ravel())
    b = 2 * n
    x = jax.random.uniform(jax.random.PRNGKey(1), (b, 32, 32, 3),
                           minval=-1, maxval=1)
    y = jnp.arange(b, dtype=jnp.int32) % 3
    s = jax.random.normal(jax.random.PRNGKey(2), (b, 8))
    with mesh:
        sh = batch_sharding(mesh)
        sharded = jax.jit(g.call, in_shardings=(sh, sh, sh),
                          out_shardings=sh)(x, s, y)
    want = solver.generate(state, x, s, y)
    np.testing.assert_allclose(np.asarray(sharded), np.asarray(want),
                               atol=5e-5)
