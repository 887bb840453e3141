"""Exponential moving average of a parameter pytree.

Semantics of ``torch_ema.ExponentialMovingAverage`` as used by the reference
EMA callback (``callbacks/ema.py:12-33``, decay 0.9999 from ``main.py:131``):
with ``use_num_updates=True`` (torch_ema default) the effective decay ramps as
``min(decay, (1 + n) / (10 + n))``, and the update is
``ema = decay_eff * ema + (1 - decay_eff) * param`` after every train batch.
Validation/checkpointing swap EMA weights in (``ema.py:35-52``) — in the
functional rebuild that is simply evaluating with ``ema.params``.

The whole update is one fused jitted pytree map — no per-tensor Python loop.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import struct


class EmaState(struct.PyTreeNode):
    params: Any
    num_updates: jnp.ndarray  # int32 scalar
    decay: float = struct.field(pytree_node=False, default=0.9999)


def init_ema(params, decay: float = 0.9999) -> EmaState:
    # Materialise fresh buffers: the EMA tree must not alias the live params
    # (the train step donates its input state).
    return EmaState(params=jax.tree.map(jnp.copy, params),
                    num_updates=jnp.zeros((), jnp.int32),
                    decay=decay)


def update_ema(ema: EmaState, params) -> EmaState:
    n = ema.num_updates + 1
    decay_eff = jnp.minimum(
        jnp.asarray(ema.decay, jnp.float32),
        (1.0 + n.astype(jnp.float32)) / (10.0 + n.astype(jnp.float32)),
    )
    new_params = jax.tree.map(
        lambda e, p: e - (1.0 - decay_eff) * (e - p), ema.params, params)
    return EmaState(params=new_params, num_updates=n, decay=ema.decay)
