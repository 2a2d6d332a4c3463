"""Checkpointing.

Reproduces the reference's checkpoint semantics functionally
(/root/reference/defectGAN/models/networks/__init__.py:4-23 and
trainers/base_trainer.py:38-52):
  * per-tag files under ``ckpt_dir/<name>/`` with a ``latest`` alias
  * ``iter.txt`` holding (epoch, iters) for --continue_training resume
  * cross-variant warm starts (MAE -> DefectGAN, spade -> sean) via
    key-filtered restore: leaves restore where path+shape match, everything
    else keeps its fresh initialization (torch's strict=False + key remapping)

Format: flax msgpack of the full GANTrainState state-dict (params, aux state
collections, optimizer states, EMA, step) — one file per tag, atomic rename.
"""
from __future__ import annotations

import os
from pathlib import Path
from typing import Any, Optional, Tuple

import numpy as np
from flax import serialization


def _ckpt_path(ckpt_dir: Path, name: str, tag: str) -> Path:
    return Path(ckpt_dir) / name / f"{tag}_state.msgpack"


def save_checkpoint(ckpt_dir: Path, name: str, tag: Any, state,
                    epoch: Optional[int] = None,
                    iters: Optional[int] = None) -> Path:
    """Write state under ``tag`` (an epoch number or 'latest') and update
    iter.txt when (epoch, iters) is given. On multi-host runs only the
    primary process writes (params are replicated; every host may read)."""
    import jax
    path = _ckpt_path(ckpt_dir, name, str(tag))
    if jax.process_index() != 0:
        return path
    d = Path(ckpt_dir) / name
    d.mkdir(parents=True, exist_ok=True)
    payload = serialization.msgpack_serialize(
        serialization.to_state_dict(state))
    tmp = path.with_suffix(".tmp")
    tmp.write_bytes(payload)
    os.replace(tmp, path)
    if epoch is not None and iters is not None:
        (d / "iter.txt").write_text(f"{epoch},{iters}\n")
    return path


def read_iter_record(ckpt_dir: Path, name: str) -> Tuple[int, int]:
    """(first_epoch, iters) from iter.txt (base_trainer.py:43-44)."""
    txt = (Path(ckpt_dir) / name / "iter.txt").read_text().strip()
    epoch, iters = txt.split(",")
    return int(epoch), int(iters)


def _merge_filtered(target: Any, loaded: Any, path: str = "",
                    stats: Optional[dict] = None) -> Any:
    """Recursively take leaves from ``loaded`` where structure+shape match."""
    if isinstance(target, dict):
        if not isinstance(loaded, dict):
            if stats is not None:
                stats["skipped"].append(path)
            return target
        out = {}
        for k, v in target.items():
            if k in loaded:
                out[k] = _merge_filtered(v, loaded[k], f"{path}/{k}", stats)
            else:
                if stats is not None:
                    stats["missing"].append(f"{path}/{k}")
                out[k] = v
        return out
    # leaf
    t_arr = np.asarray(target) if target is not None else None
    if loaded is None or t_arr is None:
        return target
    l_arr = np.asarray(loaded)
    if t_arr.shape != l_arr.shape:
        if stats is not None:
            stats["shape_mismatch"].append(path)
        return target
    if stats is not None:
        stats["restored"] += 1
    return l_arr.astype(t_arr.dtype) if t_arr.dtype != l_arr.dtype else l_arr


def load_checkpoint(ckpt_dir: Path, name: str, tag: Any, target,
                    strict: bool = True, verbose: bool = True):
    """Restore ``target``-structured state from the ``tag`` checkpoint.

    strict=False performs the key-filtered warm start (networks/__init__.py:
    14-23 semantics)."""
    path = _ckpt_path(ckpt_dir, name, str(tag))
    raw = serialization.msgpack_restore(path.read_bytes())
    if strict:
        return serialization.from_state_dict(target, raw)
    target_sd = serialization.to_state_dict(target)
    stats = {"restored": 0, "missing": [], "shape_mismatch": [], "skipped": []}
    merged = _merge_filtered(target_sd, raw, stats=stats)
    if verbose and (stats["missing"] or stats["shape_mismatch"]):
        print(f"[checkpoint] filtered restore: {stats['restored']} leaves, "
              f"{len(stats['missing'])} missing, "
              f"{len(stats['shape_mismatch'])} shape-mismatched")
    return serialization.from_state_dict(target, merged)


def latest_exists(ckpt_dir: Path, name: str) -> bool:
    return _ckpt_path(ckpt_dir, name, "latest").exists()
