"""Serving export: portable StableHLO inference artifacts via ``jax.export``.

The reference repos have no deployment story beyond "load the .pth in
torch"; a TPU-native framework gets one for free from XLA's AOT pipeline.
Each exporter below closes the trained parameters over the jitted inference
function (weights are baked into the artifact as constants), gives the batch
dimension a symbolic size (one artifact serves any batch), and can lower for
several platforms at once (``platforms=("cpu", "tpu")``: export on a CPU dev
host, serve on a TPU host, same bytes).

Artifacts round-trip through ``save_exported`` / ``load_exported``; a loaded
``jax.export.Exported`` runs via ``.call(*args)`` (itself jittable and
shardable on the serving side).

Entry point: ``cli/export_model.py``.
"""
from __future__ import annotations

from pathlib import Path
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax import export as jexport

__all__ = [
    "export_defectgan_generator",
    "export_sgv2_generator",
    "export_sgv2_style_encoder",
    "export_sgv2_mapping",
    "save_exported",
    "load_exported",
]


def _batched_specs(batch: str, *tails: Tuple[Tuple[int, ...], jnp.dtype]):
    """ShapeDtypeStructs ``(b, *tail)`` sharing one symbolic batch dim."""
    scope = jexport.SymbolicScope()
    (b,) = jexport.symbolic_shape(batch, scope=scope)
    return [jax.ShapeDtypeStruct((b, *tail), dt) for tail, dt in tails]


def _export(fn, specs, platforms: Optional[Sequence[str]]):
    kw = {"platforms": tuple(platforms)} if platforms else {}
    return jexport.export(jax.jit(fn), **kw)(*specs)


def export_defectgan_generator(steps, state, *, use_ema: bool = False,
                               platforms: Optional[Sequence[str]] = None,
                               batch: str = "b") -> "jexport.Exported":
    """Export the DefectGAN compositional forward (defectgan_model.py:302-314
    eval path) as ``fn(bg_imgs, labels[, style_feat], seed) -> (out, prob)``.

    ``seed`` is a traced uint32 scalar feeding the in-graph noise/latent
    keys, so a served artifact can still vary stochastic layers per request
    (``add_noise``/adain sampling); pass any constant for determinism.
    sean mode takes the explicit style-feature stack (zeros = running-stats
    styles, as in ``metrics.evaluator.defectgan_generator_fn``).
    """
    cfg = steps.cfg
    hw = (cfg.image_size, cfg.image_size)
    tails = [((*hw, 3), jnp.float32), ((cfg.label_nc,), jnp.float32)]
    sean = cfg.style_norm_block_type == "sean"
    if sean:
        tails.append(((cfg.num_embeds, cfg.embed_nc), jnp.float32))
    specs = _batched_specs(batch, *tails)
    seed_spec = jax.ShapeDtypeStruct((), jnp.uint32)

    if sean:
        def fn(data, labels, feat, seed):
            return steps.generate(state, data, labels, feat,
                                  rng=jax.random.PRNGKey(seed),
                                  use_ema=use_ema)
    else:
        def fn(data, labels, seed):
            return steps.generate(state, data, labels, None,
                                  rng=jax.random.PRNGKey(seed),
                                  use_ema=use_ema)
    return _export(fn, [*specs, seed_spec], platforms)


def export_sgv2_generator(solver, state, *, use_ema: bool = True,
                          platforms: Optional[Sequence[str]] = None,
                          batch: str = "b") -> "jexport.Exported":
    """Export the StarGAN v2 generator ``fn(x_src, s, y_trg) -> image``
    (core/model.py Generator eval path, EMA weights by default).

    ``s`` is a style code from either exported companion program
    (``export_sgv2_style_encoder`` / ``export_sgv2_mapping``); sean mode
    styles are the (num_embeds, embed_nc) stacks. ``w_hpf > 0`` configs need
    the FAN mask inputs and are refused — export the aligned-crop pipeline
    separately or retrain with w_hpf=0 for serving.
    """
    cfg = solver.cfg
    if getattr(cfg, "w_hpf", 0.0) > 0:
        raise ValueError(
            "export_sgv2_generator: w_hpf > 0 needs in-graph FAN masks; "
            "serving export supports w_hpf == 0 configs")
    if cfg.norm_type == "sean":
        s_tail = ((cfg.num_embeds, cfg.embed_nc), jnp.float32)
    else:
        s_tail = ((cfg.style_dim,), jnp.float32)
    x_spec, s_spec, y_spec = _batched_specs(
        batch, ((cfg.img_size, cfg.img_size, 3), jnp.float32), s_tail,
        ((), jnp.int32))

    def fn(x, s, y):
        return solver.generate(state, x, s, y, use_ema=use_ema)

    return _export(fn, [x_spec, s_spec, y_spec], platforms)


def export_sgv2_style_encoder(solver, state, *,
                              platforms: Optional[Sequence[str]] = None,
                              batch: str = "b") -> "jexport.Exported":
    """Export ``fn(x_ref, y_ref) -> s`` (EMA style encoder)."""
    cfg = solver.cfg
    x_spec, y_spec = _batched_specs(
        batch, ((cfg.img_size, cfg.img_size, 3), jnp.float32),
        ((), jnp.int32))

    def fn(x, y):
        return solver.S.apply({"params": state.ema_S}, x, y)

    return _export(fn, [x_spec, y_spec], platforms)


def export_sgv2_mapping(solver, state, *,
                        platforms: Optional[Sequence[str]] = None,
                        batch: str = "b") -> "jexport.Exported":
    """Export ``fn(z, y) -> s`` (EMA mapping network)."""
    cfg = solver.cfg
    z_spec, y_spec = _batched_specs(
        batch, ((cfg.latent_dim,), jnp.float32), ((), jnp.int32))

    def fn(z, y):
        return solver.M.apply({"params": state.ema_M}, z, y)

    return _export(fn, [z_spec, y_spec], platforms)


def save_exported(exported: "jexport.Exported", path) -> Path:
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    path.write_bytes(exported.serialize())
    return path


def load_exported(path) -> "jexport.Exported":
    return jexport.deserialize(Path(path).read_bytes())
