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


def fsdp_spec_for_leaf(leaf, dp: int, tp: int = 1) -> P:
    """ZeRO-3-style spec: shard the largest eligible axis of the leaf over
    'dp' (params + both Adam moments get 1/dp resident per chip; GSPMD
    all-gathers just-in-time for each use and reduce-scatters the
    gradients).  Composes with Megatron tp: a 4-D conv kernel keeps its
    output channels on 'tp' and additionally shards its largest remaining
    axis on 'dp'.  Small leaves (biases, norm scales, scalars) replicate —
    gathering them would cost more latency than their bytes."""
    if dp <= 1 or not hasattr(leaf, "ndim"):
        return tp_spec_for_leaf(leaf, tp) if tp > 1 else P()
    spec = list(tp_spec_for_leaf(leaf, tp)) if (
        tp > 1 and leaf.ndim == 4) else [None] * leaf.ndim
    best_axis, best_dim = None, 0
    for axis in range(leaf.ndim):
        if axis < len(spec) and spec[axis] is not None:
            continue  # already tp-sharded
        dim = leaf.shape[axis]
        # only worth sharding when every chip keeps a real tile
        if dim % dp == 0 and dim >= dp * 8 and dim > best_dim:
            best_axis, best_dim = axis, dim
    if best_axis is None:
        return P(*spec) if any(s is not None for s in spec) else P()
    spec = spec + [None] * (leaf.ndim - len(spec))
    spec[best_axis] = "dp"
    return P(*spec)


def shard_tree_for_tp(tree, mesh: Mesh, tp: int):
    """Place every leaf of a state pytree with its tp sharding."""
    if tp <= 1:
        return jax.device_put(tree, NamedSharding(mesh, P()))
    return jax.tree.map(
        lambda leaf: jax.device_put(
            leaf, NamedSharding(mesh, tp_spec_for_leaf(leaf, tp))),
        tree)


def shard_state(tree, mesh: Mesh, tp: int = 1, fsdp: bool = False):
    """Place a TrainState pytree for the requested parallelism mix.

    ``fsdp=True`` shards every large leaf (params, Adam mu/nu — the
    optimizer state mirrors the param tree, so the same per-leaf rule
    covers it) over the mesh 'dp' axis in addition to any 'tp' channel
    sharding.  The jitted train step inherits these placements: GSPMD
    all-gathers parameters where they are consumed and reduce-scatters
    the gradients, which is ZeRO-3 semantics without any step-function
    changes.  With ``fsdp=False`` this is exactly ``shard_tree_for_tp``."""
    if not fsdp:
        return shard_tree_for_tp(tree, mesh, tp)
    dp = mesh.shape.get("dp", 1)
    return jax.tree.map(
        lambda leaf: jax.device_put(
            leaf, NamedSharding(mesh, fsdp_spec_for_leaf(leaf, dp, tp))),
        tree)
