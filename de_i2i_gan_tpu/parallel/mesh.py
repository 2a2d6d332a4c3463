"""Device mesh + sharding helpers.

The reference's only parallelism is single-process nn.DataParallel
(/root/reference/stargan-v2/core/model.py:695-704) and an unused --gpu_ids
flag on the defectGAN side (options/base_options.py:163-175). Here multi-chip
scale is native:

  * a 1-D ``data`` mesh over all chips (ICI); batch dimension sharded, every
    parameter/optimizer/EMA pytree replicated
  * the alternating G/D step is jitted with NamedSharding constraints; GSPMD
    inserts the gradient all-reduces (and makes BatchNorm statistics *global*
    across chips — stronger than DataParallel's per-replica stats)
  * a ``spatial`` mesh axis is available for sharding H of very large
    (>=1024^2) inference batches across chips (SURVEY.md §2.3's
    sequence-parallel analog)

Multi-host would extend the same mesh over jax.distributed processes; no
NCCL/MPI-style backend code exists or is needed.
"""
from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, spatial: int = 1,
              platform: Optional[str] = None) -> Mesh:
    """1-D data mesh (optionally n_data x spatial 2-D) over the first
    ``n_devices`` devices.

    When the default platform has too few devices (e.g. the axon-tunneled
    single TPU during development), falls back to the virtual CPU devices so
    an 8-way mesh is actually 8-way — never a silent 1-device mesh.
    """
    devices = jax.devices(platform) if platform else jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    if len(devices) < n_devices and platform is None:
        cpu = jax.devices("cpu")
        if len(cpu) >= n_devices:
            devices = cpu
    assert len(devices) >= n_devices, (
        f"requested {n_devices} devices, have {len(devices)} "
        f"(set XLA_FLAGS=--xla_force_host_platform_device_count={n_devices})")
    devices = np.asarray(devices[:n_devices])
    if spatial > 1:
        assert n_devices % spatial == 0
        return Mesh(devices.reshape(n_devices // spatial, spatial),
                    ("data", "spatial"))
    return Mesh(devices, ("data",))


def replicate(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh, batch_axis: int = 0) -> NamedSharding:
    """Sharding with 'data' on ``batch_axis`` (axis 1 for the
    (num_critics/iters_per_launch, B, ...) super-batches)."""
    return NamedSharding(mesh, P(*([None] * batch_axis), "data"))


def shard_batch(batch: Any, mesh: Mesh, batch_axis: int = 0) -> Any:
    """Device-put a host batch with the batch axis sharded over 'data'."""
    sh = batch_sharding(mesh, batch_axis)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), batch)


def make_parallel_step(step_fn, mesh: Mesh, donate_state: bool = True,
                       batch_axis: int = 0, frozen=None):
    """Wrap a (state, batch, rng) -> (state, metrics) step for the mesh:
    state/rng replicated, batch sharded on ``batch_axis``. GSPMD handles the
    per-network gradient all-reduce over ICI.

    ``frozen``: optional dict of REPLICATED extras merged into the batch
    inside the jitted step (e.g. a StarGAN-v2 solver's frozen-ViT params,
    solver.frozen_args()). They must ride as jit arguments — closed over,
    an 86M-param pytree inlines as ~344 MB of HLO constants (measured
    round 5) — and they must not take the batch sharding (they have no
    batch axis)."""
    repl = replicate(mesh)
    data = batch_sharding(mesh, batch_axis)
    if frozen:
        def fn(state, batch, rng, fz):
            return step_fn(state, {**batch, **fz}, rng)

        jitted = jax.jit(
            fn,
            in_shardings=(repl, data, repl, repl),
            out_shardings=(repl, repl),
            donate_argnums=(0,) if donate_state else (),
        )
        return lambda state, batch, rng: jitted(state, batch, rng, frozen)
    return jax.jit(
        step_fn,
        in_shardings=(repl, data, repl),
        out_shardings=(repl, repl),
        donate_argnums=(0,) if donate_state else (),
    )


def put_replicated(tree: Any, mesh: Mesh) -> Any:
    """Host pytree -> fully-replicated mesh arrays (multi-host safe: every
    process must hold the same values, e.g. a same-seed init or a loaded
    checkpoint)."""
    sh = replicate(mesh)
    if jax.process_count() > 1:
        return jax.tree_util.tree_map(
            lambda x: jax.make_array_from_process_local_data(
                sh, np.asarray(x)), tree)
    return jax.device_put(tree, sh)


def put_batch(batch: Any, sharding: NamedSharding) -> Any:
    """Host batch -> mesh array under ``sharding``. On multi-host meshes each
    process contributes its local rows (global batch = per-host batch x
    process_count along the sharded axis)."""
    if jax.process_count() > 1:
        return jax.tree_util.tree_map(
            lambda x: jax.make_array_from_process_local_data(
                sharding, np.asarray(x)), batch)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding),
                                  batch)


def mesh_from_flag(mode: str, batch_size: int) -> Optional[Mesh]:
    """Resolve the --data_parallel CLI flag ('auto'|'on'|'off') to a Mesh.

    'auto': a 1-D data mesh over ALL devices (all hosts' chips under
    jax.distributed) when more than one is visible and the per-host batch
    divides the local device count; None otherwise. 'on' raises instead of
    silently falling back.
    """
    if mode == "off":
        return None
    n_local = len(jax.local_devices())
    n_total = len(jax.devices())
    if n_total <= 1:
        if mode == "on":
            raise RuntimeError("--data_parallel on: only one device visible")
        return None
    if batch_size % n_local != 0:
        msg = (f"--data_parallel: batch_size {batch_size} does not divide "
               f"{n_local} local devices")
        if mode == "on":
            raise RuntimeError(msg)
        print(f"[data_parallel] {msg}; running single-device")
        return None
    return Mesh(np.asarray(jax.devices()), ("data",))


def spatial_sharded_inference(apply_fn, mesh: Mesh):
    """Jit an inference fn (variables, images, labels) -> images with the
    image H dimension sharded over the 'spatial' mesh axis (for >=1024^2
    batched folder inference; BASELINE.json config #5). Halo exchanges for the
    convolutions are inserted by GSPMD."""
    repl = replicate(mesh)
    img_sh = NamedSharding(mesh, P("data", "spatial"))
    return jax.jit(apply_fn,
                   in_shardings=(repl, img_sh, repl),
                   out_shardings=img_sh)
