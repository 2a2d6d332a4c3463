"""Failure detection / recovery (SURVEY.md §5.3 — absent in the reference,
whose only fault tolerance is a NaN scrub in the generator forward).

- ``metrics_finite``: cheap host check of a step's metric dict
- ``NaNGuard``: wraps the training loop's step results; on a non-finite
  metric it (a) skips the poisoned state, (b) restores the last known-good
  snapshot (kept on device every ``snapshot_every`` steps), (c) counts
  strikes and aborts after ``max_strikes`` consecutive failures so a
  divergent run fails loudly instead of burning a TPU reservation.
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np


def metrics_finite(metrics: Dict[str, Any]) -> bool:
    return all(np.isfinite(float(v)) for v in metrics.values())


class NaNGuard:
    def __init__(self, snapshot_every: int = 100, max_strikes: int = 3):
        self.snapshot_every = snapshot_every
        self.max_strikes = max_strikes
        self._snapshot = None
        self._strikes = 0
        self._step = 0
        self.restores = 0

    def update(self, state, metrics: Dict[str, Any]) -> Tuple[Any, bool]:
        """Returns (state_to_continue_from, step_was_accepted)."""
        self._step += 1
        if metrics_finite(metrics):
            self._strikes = 0
            if self._snapshot is None or \
                    self._step % self.snapshot_every == 0:
                # deep copy: the live state's buffers are donated into the
                # next jitted step and would be invalidated under an alias
                import jax.numpy as jnp
                self._snapshot = jax.tree_util.tree_map(jnp.copy, state)
            return state, True
        self._strikes += 1
        self.restores += 1
        if self._strikes >= self.max_strikes:
            raise FloatingPointError(
                f"training diverged: {self._strikes} consecutive non-finite "
                f"steps (last metrics: { {k: float(v) for k, v in metrics.items()} })")
        if self._snapshot is not None:
            # hand out a COPY: the caller feeds the returned state into a
            # donate_argnums=0 jitted step, which would invalidate the
            # snapshot's buffers and make a second restore return deleted
            # arrays exactly when rollback is needed
            import jax.numpy as jnp
            return jax.tree_util.tree_map(jnp.copy, self._snapshot), False
        return state, False
