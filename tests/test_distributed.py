"""2-process jax.distributed CPU test for parallel/distributed.py
(VERDICT r1 weak #6: the multi-host path had never executed).

Spawns two real OS processes that form a jax.distributed cluster over a
localhost coordinator, each with 2 virtual CPU devices, and validates
init, per-host shards, a cross-process collective, and the primary gate
(see tests/_distributed_worker.py).
"""
import os
import socket
import subprocess
import sys
from pathlib import Path

import pytest

# long-compile module (sgv2 programs / mesh GSPMD / subprocess workers);
# deselect with -m 'not slow' (pyproject [tool.pytest.ini_options].markers)
pytestmark = pytest.mark.slow

WORKER = Path(__file__).parent / "_distributed_worker.py"
REPO = Path(__file__).parent.parent


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_distributed_init_and_collective(tmp_path):
    addr = f"127.0.0.1:{_free_port()}"
    env = {k: v for k, v in os.environ.items()
           if k != "PALLAS_AXON_POOL_IPS"}  # no ambient TPU registration
    env["PYTHONPATH"] = str(REPO) + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [sys.executable, str(WORKER), addr, "2", str(pid),
             str(tmp_path)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True)
        for pid in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=240)
            outs.append(out)
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.fail(f"distributed workers hung; partial output: {outs}")
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out}"
        assert f"worker {pid} OK" in out, out
    # primary-gated checkpointing: both processes called save_checkpoint;
    # only process 0's write happened
    import numpy as np
    from flax import serialization
    ck = tmp_path / "mh" / "latest_state.msgpack"
    assert ck.exists()
    raw = serialization.msgpack_restore(ck.read_bytes())
    assert np.allclose(raw["w"], 1.0), raw  # pid 0's payload, not pid 1's


def test_initialize_noop_single_process():
    # in-process: no env vars, num_processes=None -> must not touch
    # jax.distributed (calling it twice would raise)
    from de_i2i_gan_tpu.parallel.distributed import initialize
    initialize()
    initialize(num_processes=1)
