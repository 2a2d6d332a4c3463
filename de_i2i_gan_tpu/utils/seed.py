"""Determinism helpers (reference: utils/util.py:21-36 fix_rand_seed +
worker_init_fn). JAX is deterministic by construction given PRNG keys; this
pins the host-side numpy/python randomness the data pipeline uses."""
from __future__ import annotations

import random

import numpy as np


def fix_rand_seed(seed: int = 123) -> None:
    random.seed(seed)
    np.random.seed(seed)


def worker_rng(seed: int, worker_id: int) -> np.random.Generator:
    return np.random.default_rng(seed + worker_id)
