"""Parameter partitioning rules for tensor parallelism.

Megatron-style channel sharding for conv networks: 4-D conv kernels shard
their output-channel axis over the mesh 'tp' axis (GSPMD then propagates the
activation shardings and inserts the all-gathers/reduce-scatters); 1-D
biases and norm parameters replicate — at these sizes their memory is noise
and replication avoids collective chatter on the hot path.

Used by the Trainer's ``--tp`` flag and by the driver's
``dryrun_multichip``.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def tp_spec_for_leaf(leaf, tp: int) -> P:
    if (hasattr(leaf, "ndim") and leaf.ndim == 4
            and leaf.shape[-1] % tp == 0 and leaf.shape[-1] >= tp * 8):
        return P(None, None, None, "tp")
    return P()


def shard_tree_for_tp(tree, mesh: Mesh, tp: int):
    """Place every leaf of a state pytree with its tp sharding."""
    if tp <= 1:
        return jax.device_put(tree, NamedSharding(mesh, P()))
    return jax.tree.map(
        lambda leaf: jax.device_put(
            leaf, NamedSharding(mesh, tp_spec_for_leaf(leaf, tp))),
        tree)
