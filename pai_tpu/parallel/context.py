"""Trace-time mesh context for mesh-aware op dispatch.

Two op layers need to know the active device mesh at *trace* time, where
no sharding information is otherwise visible to library code:

* ``pai_tpu.ops.attention`` — to route long sequences to ring attention
  when the mesh has a populated 'sp' axis (--sp), and to wrap the Pallas
  flash-attention kernel in ``shard_map`` on dp/tp meshes (a bare
  ``pallas_call`` carries no GSPMD partitioning spec, so without the wrap
  multi-chip jits must fall back to the XLA blockwise formulation).
* ``pai_tpu.utils.metrics`` — same story for the fused SSIM kernels.

The context is a ``contextvars.ContextVar`` rather than a module global:
each thread / task sees its own value, so a second Trainer or a
concurrent report in the same process cannot mis-dispatch through a
stale mesh (round-2 review finding on the former ``_SEQ_MESH`` global).
"""

from __future__ import annotations

from contextvars import ContextVar
from typing import NamedTuple, Optional


class MeshContext(NamedTuple):
    mesh: object                      # jax.sharding.Mesh
    sp_axis: Optional[str] = None     # set iff sequence sharding requested


_CTX: ContextVar = ContextVar("pai_tpu_mesh_context", default=None)


def set_mesh_context(mesh, sp_axis: Optional[str] = None) -> None:
    """Install (or clear, with ``mesh=None``) the active mesh. The Trainer
    installs its mesh for the duration of ``fit`` and clears it after."""
    _CTX.set(MeshContext(mesh, sp_axis) if mesh is not None else None)


def get_mesh_context() -> Optional[MeshContext]:
    return _CTX.get()


class mesh_context:
    """Scoped form of :func:`set_mesh_context` (tests, library callers)."""

    def __init__(self, mesh, sp_axis: Optional[str] = None):
        self.mesh, self.sp_axis = mesh, sp_axis

    def __enter__(self):
        self._token = _CTX.set(
            MeshContext(self.mesh, self.sp_axis)
            if self.mesh is not None else None)
        return self

    def __exit__(self, *exc):
        _CTX.reset(self._token)
