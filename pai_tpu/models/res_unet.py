"""Residual U-Net with a four-way residual-block registry.

Parity with reference ``models/res_unet.py``:
* Block types selected by string: "18" (two 3x3 convs + 1x1 projection skip,
  ``res_unet.py:52-74``), "50" bottleneck with width ``in_channels // 4``
  (``res_unet.py:77-105``), "v2" pre-activation (``res_unet.py:108-130``),
  "next" grouped-conv ResNeXt, cardinality 32, bottleneck width 4
  (``res_unet.py:133-171``). Registry dict mirrors ``res_unet.py:174-179``.
* Encoder = block + MaxPool2d(2) (``res_unet.py:194-203``); decoder = block +
  Dropout2d + nearest 2x upsample (``res_unet.py:219-235``).
* Stem 3x3 conv to 64 channels (``res_unet.py:265``); one extra no-skip
  decoder at the end, then 3x3 conv + tanh head (``res_unet.py:298-315``).

Note the reference's "next" and "v2" blocks have no post-sum ReLU and "next"
keeps a trailing ReLU inside the conv branch (``res_unet.py:147-163``) — both
replicated as-is.
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn

from pai_tpu.ops import (
    BatchNorm,
    Conv,
    Dropout2d,
    max_pool_2x,
    upsample_nearest_2x,
)
from pai_tpu.models.pix2pix import dropout_for_level


class ResidualBlock18(nn.Module):
    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        h = Conv(self.features, 3, padding=1, dtype=self.dtype)(x)
        h = BatchNorm(use_running_average=not train)(h)
        h = nn.relu(h)
        h = Conv(self.features, 3, padding=1, dtype=self.dtype)(h)
        h = BatchNorm(use_running_average=not train)(h)
        if x.shape[-1] != self.features:
            skip = Conv(self.features, 1, dtype=self.dtype)(x)
            skip = BatchNorm(use_running_average=not train)(skip)
        else:
            skip = x
        return nn.relu(h + skip)


class ResidualBlock50(nn.Module):
    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        bottleneck = x.shape[-1] // 4
        h = Conv(bottleneck, 1, dtype=self.dtype)(x)
        h = BatchNorm(use_running_average=not train)(h)
        h = nn.relu(h)
        h = Conv(bottleneck, 3, padding=1, dtype=self.dtype)(h)
        h = BatchNorm(use_running_average=not train)(h)
        h = nn.relu(h)
        h = Conv(self.features, 1, dtype=self.dtype)(h)
        h = BatchNorm(use_running_average=not train)(h)
        if x.shape[-1] != self.features:
            skip = Conv(self.features, 1, dtype=self.dtype)(x)
            skip = BatchNorm(use_running_average=not train)(skip)
        else:
            skip = x
        return nn.relu(h + skip)


class ResidualBlockV2(nn.Module):
    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        h = BatchNorm(use_running_average=not train)(x)
        h = nn.relu(h)
        h = Conv(self.features, 3, padding=1, dtype=self.dtype)(h)
        h = BatchNorm(use_running_average=not train)(h)
        h = nn.relu(h)
        h = Conv(self.features, 3, padding=1, dtype=self.dtype)(h)
        if x.shape[-1] != self.features:
            skip = BatchNorm(use_running_average=not train)(x)
            skip = nn.relu(skip)
            skip = Conv(self.features, 1, dtype=self.dtype)(skip)
        else:
            skip = x
        return h + skip


class ResidualBlockNeXt(nn.Module):
    features: int
    cardinality: int = 32
    bottleneck: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        inner = self.bottleneck * self.cardinality
        h = Conv(inner, 1, dtype=self.dtype)(x)
        h = BatchNorm(use_running_average=not train)(h)
        h = nn.relu(h)
        h = Conv(inner, 3, padding=1, groups=self.cardinality,
                 dtype=self.dtype)(h)
        h = BatchNorm(use_running_average=not train)(h)
        h = nn.relu(h)
        h = Conv(self.features, 1, dtype=self.dtype)(h)
        h = BatchNorm(use_running_average=not train)(h)
        h = nn.relu(h)  # trailing ReLU inside the branch, as in the reference
        if x.shape[-1] != self.features:
            skip = Conv(self.features, 1, dtype=self.dtype)(x)
            skip = BatchNorm(use_running_average=not train)(skip)
        else:
            skip = x
        return h + skip


RES_BLOCKS = {
    "18": ResidualBlock18,
    "50": ResidualBlock50,
    "v2": ResidualBlockV2,
    "next": ResidualBlockNeXt,
}


class ResUnet(nn.Module):
    out_channels: int = 1
    res_type: str = "18"
    channel_mults: Sequence[int] = (1, 2, 4, 8, 8, 8, 8, 8)
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        mults = tuple(self.channel_mults)
        block = RES_BLOCKS[self.res_type]
        h = Conv(64, 3, padding=1, dtype=self.dtype, name="stem")(
            x.astype(self.dtype))

        skips = []
        for level, mult in enumerate(mults):
            h = block(mult * 64, dtype=self.dtype, name=f"enc_{level}")(
                h, train)
            h = max_pool_2x(h)
            skips.append(h)

        skips.pop()

        for i, (level, mult) in enumerate(
                reversed(list(enumerate(mults[:-1])))):
            if i != 0:
                h = jnp.concatenate([h, skips.pop()], axis=-1)
            h = block(mult * 64, dtype=self.dtype, name=f"dec_{i}")(h, train)
            rate = dropout_for_level(level, mult, mults, self.dropout)
            h = Dropout2d(rate)(h, deterministic=not train)
            h = upsample_nearest_2x(h)

        # Extra final decoder (no skip, no dropout), res_unet.py:298-304.
        h = jnp.concatenate([h, skips.pop()], axis=-1)
        h = block(mults[0] * 64, dtype=self.dtype, name="dec_final")(h, train)
        h = upsample_nearest_2x(h)

        h = Conv(self.out_channels, 3, padding=1, dtype=self.dtype,
                 name="head")(h)
        return jnp.tanh(h.astype(jnp.float32))
