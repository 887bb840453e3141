"""Device-mesh and sharding utilities (SPMD over ICI).

The reference configures no parallelism at all (SURVEY §2.4-2.5); here
data-parallel training over a ``('dp', 'tp')`` mesh is first-class: batches
shard over 'dp', parameters replicate, and XLA inserts the gradient psum and
cross-replica BatchNorm reductions from the sharding alone.
"""

from pai_tpu.parallel.mesh import (
    make_mesh,
    batch_sharding,
    replicated_sharding,
    shard_batch,
    place_replicated,
)
from pai_tpu.parallel.partitioning import (
    tp_spec_for_leaf,
    fsdp_spec_for_leaf,
    shard_tree_for_tp,
    shard_state,
)
