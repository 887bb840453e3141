"""Pallas/Mosaic TPU kernels — the native compute tier of the framework
(the reference's equivalent layer is cuDNN/cuBLAS via torch, SURVEY §2.3).

Each kernel ships with an XLA reference implementation and a parity test;
callers dispatch to Pallas on TPU and fall back to XLA elsewhere.

Interpret mode: setting ``PAI_TPU_KERNELS_INTERPRET=1`` (or calling
``set_interpret(True)``) makes the dispatchers treat the host platform as
kernel-capable and run every ``pallas_call`` with ``interpret=True`` —
how the CPU-mesh tests and the driver's ``dryrun_multichip`` exercise the
sharded-kernel dispatch paths without TPU hardware.
"""

from __future__ import annotations

import os

import jax

_INTERPRET = os.environ.get("PAI_TPU_KERNELS_INTERPRET", "") == "1"


def set_interpret(enabled: bool) -> None:
    global _INTERPRET
    _INTERPRET = bool(enabled)


def interpret_enabled() -> bool:
    return _INTERPRET


def kernels_available() -> bool:
    """True when a pallas_call can execute here: real TPU backend, or
    interpret mode forced for host-platform testing."""
    return _INTERPRET or jax.default_backend() == "tpu"
