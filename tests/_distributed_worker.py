"""Worker program for the 2-process jax.distributed CPU test.

Spawned by tests/test_distributed.py:
    python _distributed_worker.py <coordinator_addr> <num_procs> <pid>

Each process forces 2 local CPU devices, joins the cluster via
parallel.distributed.initialize, and validates: process_count, per-host
data shards, a cross-process collective (global sum over a 4-device
mesh assembled from per-process shards), and the primary gate.
Prints one OK line that the parent asserts on.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from de_i2i_gan_tpu import cpu_xla_flags  # noqa: E402 (no jax import)

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = cpu_xla_flags(os.environ.get("XLA_FLAGS", ""),
                                        devices=2)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from de_i2i_gan_tpu.parallel.distributed import (  # noqa: E402
    initialize, is_primary, process_shard)


def main(addr: str, num_procs: int, pid: int,
         ckpt_dir: str = "") -> None:
    initialize(coordinator_address=addr, num_processes=num_procs,
               process_id=pid)
    assert jax.process_count() == num_procs, jax.process_count()
    assert jax.process_index() == pid
    assert len(jax.local_devices()) == 2
    assert len(jax.devices()) == 2 * num_procs
    assert is_primary() == (pid == 0)

    # per-host data shard: contiguous, disjoint, covering
    sh = process_shard(10)
    assert sh == slice(pid * 5, 10 if pid == num_procs - 1 else pid * 5 + 5)

    # cross-process collective: global mean over a data-sharded array
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    mesh = Mesh(np.asarray(jax.devices()).reshape(-1), ("data",))
    sharding = NamedSharding(mesh, P("data"))
    # each process contributes its local rows; global = arange(4 hosts*chips)
    local = np.arange(2 * num_procs, dtype=np.float32).reshape(
        2 * num_procs, 1)[process_shard(2 * num_procs)]
    garr = jax.make_array_from_process_local_data(sharding, local)
    total = jax.jit(jnp.sum, out_shardings=NamedSharding(mesh, P()))(garr)
    expect = float(np.arange(2 * num_procs).sum())
    assert float(total) == expect, (float(total), expect)

    # per-host data shards are disjoint contiguous views
    from de_i2i_gan_tpu.data.datasets import shard_for_process
    from de_i2i_gan_tpu.data.synthetic import SyntheticDefectDataset
    ds = SyntheticDefectDataset(image_size=8, label_nc=3, length=10)
    view = shard_for_process(ds)
    assert len(view) == 5
    img, lbl, _ = view[0]
    ref_img, ref_lbl, _ = ds[pid * 5]
    assert np.allclose(img, ref_img) and np.allclose(lbl, ref_lbl)

    # checkpoint writes are primary-gated: both processes call, one file
    if ckpt_dir:
        from de_i2i_gan_tpu.train.checkpoint import save_checkpoint
        save_checkpoint(ckpt_dir, "mh", "latest",
                        {"w": np.full(3, float(pid + 1))})
    print(f"worker {pid} OK", flush=True)


if __name__ == "__main__":
    main(sys.argv[1], int(sys.argv[2]), int(sys.argv[3]),
         sys.argv[4] if len(sys.argv) > 4 else "")
