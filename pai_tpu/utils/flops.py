"""FLOP and parameter counting.

The reference counts FLOPs with fvcore over a ``randn(1, 3, 256, 256)`` probe
(``report.py:149-154``) and parameters by summing ``numel``
(``models/utils.py:31-35``). Here FLOPs come from XLA's own cost model via
``jit(...).lower(...).compile().cost_analysis()`` — the number XLA actually
schedules against.
"""

from __future__ import annotations

import jax
import numpy as np


def parameter_count(params) -> int:
    return sum(int(np.prod(x.shape)) for x in jax.tree.leaves(params))


def count_flops(fn, *args) -> int:
    """Total FLOPs of ``fn(*args)`` per XLA cost analysis (0 if the backend
    does not report them)."""
    try:
        compiled = jax.jit(fn).lower(*args).compile()
        analysis = compiled.cost_analysis()
        if isinstance(analysis, (list, tuple)):
            analysis = analysis[0]
        return int(analysis.get("flops", 0))
    except Exception:
        return 0
