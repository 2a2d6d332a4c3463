"""Train-state pytrees.

The reference keeps per-network mutable nn.Modules plus a dict of torch
optimizers (trainers/base_trainer.py:68-89). Here the whole training state is
one immutable pytree that flows through a jitted step:

  GANTrainState
    .G / .D / .E : NetState(params, state, opt_state)
    .ema_G       : EMA copy of generator params (stargan-v2 solver.py:549-551)
    .step        : global iteration counter

``state`` holds the non-parameter collections — BatchNorm running statistics
('batch_stats'), spectral-norm power-iteration vectors ('spectral') and SEAN
per-label running styles ('sean_stats') — made explicit instead of torch's
in-module buffers.
"""
from __future__ import annotations

from typing import Any, Optional

import flax.struct
import jax.numpy as jnp


@flax.struct.dataclass
class NetState:
    params: Any
    state: Any  # dict of aux variable collections
    opt_state: Any


@flax.struct.dataclass
class GANTrainState:
    G: NetState
    D: NetState
    E: Optional[NetState]  # AdaIN style extractor, else None
    ema_G: Any  # EMA generator params, or None
    step: jnp.ndarray  # global iteration, int32

    @property
    def generator_variables(self):
        return {"params": self.G.params, **self.G.state}

    @property
    def discriminator_variables(self):
        return {"params": self.D.params, **self.D.state}
