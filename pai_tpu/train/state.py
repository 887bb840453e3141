"""Train states as flax struct pytrees, plus the reference optimizers.

* GAN families: two independent Adam chains, lr=2e-4, betas=(0.5, 0.999),
  eps=1e-7 for both generator and discriminator (``models/wrapper.py:97-115``).
* Palette: Adam lr=1e-4 with a linear warmup over 10,000 iterations starting
  at factor 1/3 (torch ``LinearLR`` defaults, ``models/palette.py:102-108``).
  The reference hands the scheduler to Lightning, which steps it once per
  *epoch*, so the warmup unit is epochs (at 200 default epochs the reference
  effectively trains at ~lr/3 throughout). The default replicates that
  exactly via ``steps_per_epoch``; ``steps_per_epoch=None`` applies the
  warmup per optimizer step instead — the documented opt-in
  (``--warmup-unit step``) for the behaviour the torch code presumably
  intended.

EMA (when enabled) covers *all* parameters — generator and discriminator —
matching ``EMACallback`` over ``pl_module.parameters()`` (callbacks/ema.py:19-22).
"""

from __future__ import annotations

from typing import Any, Optional

import jax.numpy as jnp
import optax
from flax import struct

from pai_tpu.train.ema import EmaState


def gan_optimizer() -> optax.GradientTransformation:
    return optax.adam(learning_rate=2e-4, b1=0.5, b2=0.999, eps=1e-7)


def palette_optimizer(
        warmup_iters: int = 10000,
        base_lr: float = 1e-4,
        steps_per_epoch: Optional[int] = None
) -> optax.GradientTransformation:
    def schedule(step):
        unit = step if steps_per_epoch is None else step // steps_per_epoch
        frac = jnp.minimum(unit.astype(jnp.float32), warmup_iters) / warmup_iters
        factor = 1.0 / 3.0 + (1.0 - 1.0 / 3.0) * frac
        return base_lr * factor

    return optax.adam(learning_rate=schedule)


class GanTrainState(struct.PyTreeNode):
    step: jnp.ndarray                 # int32 optimizer-step counter
    g_params: Any
    g_stats: Any                      # generator batch_stats collection
    g_opt: Any
    d_params: Optional[Any] = None    # present only for loss_type == "gan"
    d_opt: Optional[Any] = None
    ema: Optional[EmaState] = None


class PaletteTrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    stats: Any
    opt: Any
    ema: Optional[EmaState] = None
