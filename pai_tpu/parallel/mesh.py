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
              tp: int = 1) -> Mesh:
    if devices is None:
        devices = jax.devices()
    devices = np.asarray(devices)
    if len(devices) % tp:
        raise ValueError(f"{len(devices)} devices not divisible by tp={tp}")
    dp = len(devices) // tp
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
