"""StarGAN v2 inference / visualization utilities.

Mirrors /root/reference/stargan-v2/core/utils.py:
  translate_and_reconstruct (:110-133)   src -> trg -> back panels
  translate_using_latent    (:136-156)   rows of latent-guided translations
  translate_using_reference (:159-174)   per-reference rows with src header
  alpha-mix grids           (:177-250)   multi-reference style interpolation
                                         via SEAN mix_alpha, incl. layer-split
  debug_image               (:254-334)   periodic sample dumps
  video interpolation       (:342-466)   latent walks rendered to mp4
                                         (requires ffmpeg binary; gated)

All functions return numpy grids in [0,1]; save with utils.visualize helpers.
"""
from __future__ import annotations

import shutil
import subprocess
import tempfile
from pathlib import Path
from typing import List, Optional, Sequence

import numpy as np
import jax
import jax.numpy as jnp

from de_i2i_gan_tpu.utils.visualize import make_grid


def translate_and_reconstruct(solver, state, x_src, y_src, x_ref, y_ref,
                              s_ref=None):
    """[src | ref | fake | reconstruction] panels (utils.py:110-133)."""
    if solver.cfg.norm_type == "adain":
        s = solver.S.apply({"params": state.ema_S}, x_ref, y_ref)
        s_back = solver.S.apply({"params": state.ema_S}, x_src, y_src)
    else:
        s = s_ref
        s_back = s_ref
    fake = solver.jit_generate(state, x_src, s, y_ref)
    rec = solver.jit_generate(state, fake, s_back, y_src)
    panels = jnp.concatenate([x_src, x_ref, fake, rec], axis=0)
    return make_grid(np.asarray(panels), nrow=x_src.shape[0])


def translate_using_latent(solver, state, x_src, y_trg_list: Sequence[int],
                           z_list, psi: float = 1.0):
    """Rows of latent-guided translations (utils.py:136-156); adain only."""
    rows = [np.asarray(x_src)]
    for y in y_trg_list:
        y_trg = jnp.full((x_src.shape[0],), y, jnp.int32)
        for z in z_list:
            z = jnp.broadcast_to(z, (x_src.shape[0], z.shape[-1]))
            s = solver.M.apply({"params": state.ema_M}, z, y_trg)
            rows.append(np.asarray(solver.jit_generate(state, x_src, s,
                                                       y_trg)))
    return make_grid(np.concatenate(rows, axis=0), nrow=x_src.shape[0])


def translate_using_reference(solver, state, x_src, x_ref, y_ref, s_ref=None):
    """Grid: header row of sources, one row per reference (utils.py:159-174)."""
    n_src = x_src.shape[0]
    rows = [np.asarray(x_src)]
    for i in range(x_ref.shape[0]):
        y = jnp.full((n_src,), int(y_ref[i]), jnp.int32)
        if solver.cfg.norm_type == "adain":
            s_one = solver.S.apply({"params": state.ema_S},
                                   x_ref[i:i + 1], y_ref[i:i + 1])
            s = jnp.broadcast_to(s_one, (n_src, s_one.shape[-1]))
        else:
            s = jnp.broadcast_to(s_ref[i:i + 1], (n_src, *s_ref.shape[1:]))
        rows.append(np.asarray(solver.jit_generate(state, x_src, s, y)))
    return make_grid(np.concatenate(rows, axis=0), nrow=n_src)


def translate_with_alpha_control(solver, state, x_src, y_trg, s_refs,
                                 steps: int = 5):
    """Interpolate between two reference styles via SEAN mix_alpha
    (utils.py:177-199): s_refs (N, 2, E, embed) with per-embed weights."""
    assert solver.cfg.norm_type == "sean"
    n = x_src.shape[0]
    rows = [np.asarray(x_src)]
    for t in np.linspace(0.0, 1.0, steps):
        alpha = jnp.asarray([1.0 - t, t], jnp.float32)
        alpha = jnp.broadcast_to(alpha[None], (n, 2))
        flat = s_refs.reshape(n, -1, s_refs.shape[-1])  # treat pair as embeds
        out = solver.jit_generate(
            state, x_src, flat, y_trg,
            mix_alpha=jnp.repeat(alpha, s_refs.shape[2], axis=1))
        rows.append(np.asarray(out))
    return make_grid(np.concatenate(rows, axis=0), nrow=n)


def translate_with_layer_split(solver, state, x_src, y_trg, s_pair,
                               split_index: Sequence[int]):
    """Apply style A on some decoder layers and style B on the rest
    (utils.py:200-222, Generator layer_split_index)."""
    out = solver.jit_generate(state, x_src, s_pair, y_trg,
                              layer_split_index=tuple(split_index))
    return make_grid(np.asarray(out), nrow=x_src.shape[0])


def debug_image(solver, state, inputs, step: int, sample_dir: Path,
                s_ref=None):
    """Periodic sample dump (utils.py:254-334)."""
    from PIL import Image
    sample_dir = Path(sample_dir)
    sample_dir.mkdir(parents=True, exist_ok=True)
    grid = translate_and_reconstruct(
        solver, state, jnp.asarray(inputs["x_src"]),
        jnp.asarray(inputs["y_src"]), jnp.asarray(inputs["x_ref"]),
        jnp.asarray(inputs["y_ref"]),
        s_ref=jnp.asarray(inputs["s_ref"]) if "s_ref" in inputs else None)
    arr = np.clip(grid * 255, 0, 255).astype(np.uint8)
    Image.fromarray(arr).save(sample_dir / f"{step:06d}_cycle.png")


def video_latent_walk(solver, state, x_src, y_trg, latent_dim: int,
                      out_path: Path, num_frames: int = 60,
                      fps: int = 15, seed: int = 0) -> Optional[Path]:
    """Latent interpolation video (utils.py:342-466). Renders frames and
    assembles with the ffmpeg binary when present; otherwise writes frames
    only and returns the frame directory."""
    rng = np.random.default_rng(seed)
    z0, z1 = rng.standard_normal((2, latent_dim)).astype(np.float32)
    frames_dir = Path(tempfile.mkdtemp(prefix="dig_video_"))
    n = x_src.shape[0]
    y = jnp.full((n,), int(y_trg), jnp.int32)
    from PIL import Image
    for f in range(num_frames):
        t = f / max(num_frames - 1, 1)
        z = jnp.asarray((1 - t) * z0 + t * z1)[None].repeat(n, axis=0)
        s = solver.M.apply({"params": state.ema_M}, z, y)
        out = np.asarray(solver.jit_generate(state, x_src, s, y))
        grid = make_grid(out, nrow=n)
        Image.fromarray(np.clip(grid * 255, 0, 255).astype(np.uint8)).save(
            frames_dir / f"{f:04d}.png")
    if shutil.which("ffmpeg"):
        out_path = Path(out_path)
        subprocess.run(
            ["ffmpeg", "-y", "-framerate", str(fps), "-i",
             str(frames_dir / "%04d.png"), "-pix_fmt", "yuv420p",
             str(out_path)], check=True, capture_output=True)
        return out_path
    print(f"[video] ffmpeg not found; frames at {frames_dir}")
    return frames_dir
