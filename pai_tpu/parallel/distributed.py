"""Multi-process (multi-host pod) runtime initialisation — SURVEY §2.5.

The reference is single-process/single-node (absence anchored at
/root/reference/main.py:123-135: Lightning `devices=1`); pai_tpu's SPMD
engine is process-count-agnostic, so pod execution needs exactly two
things, provided here:

* ``maybe_initialize_distributed()`` — calls ``jax.distributed.initialize``
  when a pod launcher provides coordination config (must run before the
  first backend touch). After it, ``jax.devices()`` is the GLOBAL device
  list and the Trainer's mesh spans the pod.
* per-process input sharding — each host decodes only the rows of the
  global batch that land on its local devices (``local_batch_rows``), and
  ``BatchLoader`` assembles the global array with
  ``jax.make_array_from_process_local_data``.

Launch on a pod: run one process per host with the standard JAX pod env
(TPU pods auto-configure; elsewhere set ``JAX_COORDINATOR_ADDRESS``,
``JAX_NUM_PROCESSES``, ``JAX_PROCESS_ID``) or force with
``PAI_TPU_DISTRIBUTED=1``.

Executed evidence: ``tests/test_distributed.py`` runs a REAL 2-process
cluster (localhost coordinator, 4 virtual CPU devices per process, Gloo
collectives) through the production ``Trainer.fit()`` and asserts the
validation metrics match a single-process 8-device run — including a
2-process ``--fsdp`` run that resumes from its own sharded checkpoint.
IO is Lightning-style rank-zero (logs, meta, PNGs); orbax checkpoint
saves are collective: every process enters, live sharded ``jax.Array``s
are saved shard-by-shard from their owning processes and restored onto
the target shardings (``pai_tpu/utils/checkpoint.py``), so sharded
(fsdp/tp) state never needs host materialisation.
"""

from __future__ import annotations

import os
from typing import Tuple

import jax

_INITIALIZED = False


def should_initialize(env=None) -> bool:
    env = os.environ if env is None else env
    if env.get("PAI_TPU_DISTRIBUTED") == "1":
        return True
    # standard JAX multi-process coordination variables
    return bool(env.get("JAX_COORDINATOR_ADDRESS")
                or env.get("COORDINATOR_ADDRESS"))


def maybe_initialize_distributed(env=None) -> Tuple[int, int]:
    """Initialise the JAX distributed runtime when pod coordination env is
    present; no-op otherwise. Returns (process_index, process_count).

    Must be called before the first JAX backend touch (the Trainer calls it
    at the top of ``__init__``).
    """
    global _INITIALIZED
    if should_initialize(env) and not _INITIALIZED:
        jax.distributed.initialize()
        _INITIALIZED = True
    return jax.process_index(), jax.process_count()


def local_batch_rows(batch_size: int, process_index: int,
                     process_count: int) -> range:
    """The contiguous rows of a global batch this process must load.

    Batch rows are laid out over the mesh's 'dp' axis in global device
    order, which JAX keeps process-major — so process p owns rows
    [p*B/P, (p+1)*B/P).
    """
    if batch_size % process_count:
        raise ValueError(
            f"batch_size {batch_size} not divisible by process_count "
            f"{process_count}")
    per = batch_size // process_count
    return range(process_index * per, (process_index + 1) * per)
