"""Mesh construction and sharding helpers.

Axes: 'dp' (data parallel — batch dimension, gradient psum over ICI) and
'tp' (tensor parallel — reserved for attention-head / channel sharding in
the diffusion UNet and ViT bottleneck). At parity scale (256x256, batch 8)
dp-only is optimal; tp is exercised by ``dryrun_multichip`` and tests so
scaling out is a configuration change, not a rewrite.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(devices: Optional[Sequence] = None,
              tp: int = 1, sp: int = 1) -> Mesh:
    """('dp', 'tp'[, 'sp']) mesh. 'sp' (sequence parallel — ring attention
    token sharding) is only added when requested so the 2-axis layouts of
    existing checkpoints/tests are unchanged."""
    if devices is None:
        devices = jax.devices()
    devices = np.asarray(devices)
    if len(devices) % (tp * sp):
        raise ValueError(
            f"{len(devices)} devices not divisible by tp*sp={tp * sp}")
    dp = len(devices) // (tp * sp)
    if sp > 1:
        return Mesh(devices.reshape(dp, tp, sp), ("dp", "tp", "sp"))
    return Mesh(devices.reshape(dp, tp), ("dp", "tp"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Batch dim sharded over 'dp', everything else replicated."""
    return NamedSharding(mesh, P("dp"))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    return jax.device_put(batch, batch_sharding(mesh))


def place_replicated(mesh: Mesh, tree):
    sharding = replicated_sharding(mesh)
    return jax.device_put(tree, sharding)
