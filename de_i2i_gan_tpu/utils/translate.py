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


def _get_alphas(start: float = -5, end: float = 5, step: float = 0.5,
                len_tail: int = 10) -> List[float]:
    """Sigmoid-eased interpolation schedule + hold (utils.py:342-351)."""
    ease = [float(1.0 / (1.0 + np.exp(-x)))
            for x in np.arange(start, end, step)]
    return [0.0] + ease + [1.0] * len_tail


def _slide(x_prev: np.ndarray, x_next: np.ndarray, alphas,
           margin: int = 32) -> np.ndarray:
    """Sliding reference window (utils.py:369-390): the next reference
    scrolls up over the previous one as alpha goes 0 -> 1. HWC in [-1,1]."""
    h, w, c = x_prev.shape
    merged = np.concatenate([x_prev, x_next], axis=0)  # (2H, W, C)
    canvas = -np.ones((len(alphas), 2 * h, w + margin, c), np.float32)
    for t, alpha in enumerate(alphas):
        top = int(h * (1 - alpha))
        canvas[t, top:2 * h, :w] = merged[:2 * h - top]
    return canvas


def _assemble_video(frames_dir: Path, pattern: str, out_path: Path,
                    fps: int, tag: str) -> Path:
    """Encode the rendered frame sequence to mp4 when the ffmpeg binary
    exists (removing the temp frames dir on success); otherwise leave the
    frames on disk and return their directory."""
    if shutil.which("ffmpeg"):
        out_path = Path(out_path)
        out_path.parent.mkdir(parents=True, exist_ok=True)
        subprocess.run(
            ["ffmpeg", "-y", "-framerate", str(fps), "-i",
             str(frames_dir / pattern), "-pix_fmt", "yuv420p",
             str(out_path)], check=True, capture_output=True)
        shutil.rmtree(frames_dir, ignore_errors=True)
        return out_path
    print(f"[{tag}] ffmpeg not found; frames at {frames_dir}")
    return frames_dir


def video_ref(solver, state, x_src, x_ref, y_ref, out_path: Path,
              s_ref=None, fps: int = 30, seed: int = 0) -> Optional[Path]:
    """Reference-guided interpolation video (utils.py:394-419 ``video_ref``):
    walk consecutive SAME-domain reference images, blending their styles
    with the sigmoid-eased alphas of ``get_alphas`` (utils.py:354-366
    ``interpolate``); every frame is [sliding ref panel | src row over fake
    row] (``slide``, utils.py:369-390), and the final frame holds 10x.

    adain: per-reference style codes from the EMA style encoder, lerped.
    sean: pass ``s_ref`` (N_ref, E, embed) stacks; blending uses the SEAN
    ``mix_alpha`` multi-reference weighting, like the reference's
    ``nets.generator.module.mix_alpha`` (utils.py:359-361).

    Assembles an mp4 when the ffmpeg binary exists; otherwise writes the
    frames and returns the frame directory.
    """
    from PIL import Image
    alphas = _get_alphas()
    n = x_src.shape[0]
    x_src = jnp.asarray(x_src)
    x_ref_np = np.asarray(x_ref)
    if solver.cfg.norm_type == "adain":
        styles = solver.S.apply({"params": state.ema_S},
                                jnp.asarray(x_ref), jnp.asarray(y_ref))
    else:
        assert s_ref is not None, "sean video_ref needs s_ref embed stacks"
        styles = jnp.asarray(s_ref)

    frames_dir = Path(tempfile.mkdtemp(prefix="dig_video_ref_"))
    fidx = 0

    def _write(frame: np.ndarray):
        nonlocal fidx
        arr = np.clip((frame + 1) * 127.5, 0, 255).astype(np.uint8)
        Image.fromarray(arr).save(frames_dir / f"{fidx:05d}.png")
        fidx += 1

    last = None
    prev = None
    for i in range(x_ref_np.shape[0]):
        # transitions only between same-domain consecutive refs
        # (utils.py:402-407)
        if prev is None or int(y_ref[i]) != int(y_ref[prev]):
            prev = i
            continue
        slided = _slide(x_ref_np[prev], x_ref_np[i], alphas)
        y = jnp.full((n,), int(y_ref[i]), jnp.int32)
        for t, a in enumerate(alphas):
            if solver.cfg.norm_type == "adain":
                s = (1.0 - a) * styles[prev] + a * styles[i]
                s = jnp.broadcast_to(s[None], (n, styles.shape[-1]))
                fake = solver.jit_generate(state, x_src, s, y)
            else:
                pair = jnp.concatenate([styles[prev], styles[i]],
                                       axis=0)[None]  # (1, 2E, embed)
                flat = jnp.broadcast_to(pair, (n,) + pair.shape[1:])
                w2 = jnp.asarray([1.0 - a, a], jnp.float32)
                mix = jnp.repeat(jnp.broadcast_to(w2[None], (n, 2)),
                                 styles.shape[1], axis=1)
                fake = solver.jit_generate(state, x_src, flat, y,
                                           mix_alpha=mix)
            # [src over fake] per sample, arranged horizontally
            entries = np.concatenate([np.asarray(x_src), np.asarray(fake)],
                                     axis=1)  # (n, 2H, W, C)
            row = np.concatenate(list(entries), axis=1)  # (2H, n*W, C)
            last = np.concatenate([slided[t], row], axis=1)
            _write(last)
        prev = i
    if last is None:
        print("[video_ref] no same-domain consecutive reference pair; "
              "nothing to render")
        return None
    for _ in range(10):  # hold the last frame (utils.py:414-415)
        _write(last)
    return _assemble_video(frames_dir, "%05d.png", out_path, fps,
                           tag="video_ref")


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
    return _assemble_video(frames_dir, "%04d.png", out_path, fps,
                           tag="video")
