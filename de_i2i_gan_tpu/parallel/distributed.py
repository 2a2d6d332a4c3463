"""Multi-host initialization helpers.

The reference has no multi-process support at all (SURVEY.md §2.3: torch
DataParallel only). Here multi-host TPU slices use jax.distributed: every
host runs the same program, sees its local chips, and participates in the
global mesh; data loading shards per host.
"""
from __future__ import annotations

import os
from typing import Optional


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """Initialize jax.distributed from args or the standard env vars
    (COORDINATOR_ADDRESS, NUM_PROCESSES, PROCESS_ID). No-op single-process."""
    import jax
    if num_processes in (None, 1) and "NUM_PROCESSES" not in os.environ:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id)


def process_shard(n_items: int) -> slice:
    """This host's contiguous shard of a dataset (per-host data loading).

    Every host gets exactly ``n_items // process_count`` items — the
    remainder is DROPPED. Loader lengths (and hence the number of jitted
    global-mesh super-steps per epoch) derive from the shard size, so
    unequal shards would deadlock the collective program on a real
    multi-host slice when one host runs an extra step.
    """
    import jax
    pid, n = jax.process_index(), jax.process_count()
    per = n_items // n
    start = pid * per
    return slice(start, start + per)


def is_primary() -> bool:
    import jax
    return jax.process_index() == 0
