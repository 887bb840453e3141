"""Pix2Pix U-Net generator (Isola et al. 2018), TPU-native.

Capability parity with reference ``models/pix2pix.py``:
* 8-level encoder/decoder with channels ``64 * mult`` per level
  (default mults (1,2,4,8,8,8,8,8), ``pix2pix.py:134``).
* Encoder block = LeakyReLU(0.2) -> Conv(k4,s2,p1) -> BatchNorm, with no norm
  on the innermost level (``pix2pix.py:58-74``, ``pix2pix.py:150-159``); the
  stem is a bare Conv(k4,s2,p1) (``pix2pix.py:140-148``).
* Decoder block = ReLU -> ConvTranspose(k4,s2,p1) -> BatchNorm -> Dropout2d,
  dropout only in the three deepest widest decoders (``pix2pix.py:89-108``,
  ``pix2pix.py:173-179``).
* Skip connections concatenate encoder features (innermost excluded,
  ``pix2pix.py:206-214``); final ConvTranspose to out_channels + tanh.
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn

from pai_tpu.ops import (
    BatchNorm,
    Conv,
    ConvTranspose,
    Dropout2d,
    leaky_relu,
)


class EncoderBlock(nn.Module):
    features: int
    norm: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        h = leaky_relu(x, 0.2)
        h = Conv(self.features, kernel_size=4, stride=2, padding=1,
                 dtype=self.dtype)(h)
        if self.norm:
            h = BatchNorm(use_running_average=not train)(h)
        return h


class DecoderBlock(nn.Module):
    features: int
    dropout: float = 0.5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        h = nn.relu(x)
        h = ConvTranspose(self.features, kernel_size=4, stride=2, padding=1,
                          dtype=self.dtype)(h)
        h = BatchNorm(use_running_average=not train)(h)
        h = Dropout2d(self.dropout)(h, deterministic=not train)
        return h


def dropout_for_level(level: int, mult: int,
                      channel_mults: Sequence[int], dropout: float) -> float:
    """Dropout only in the three deepest widest decoders
    (pix2pix.py:173-179): mult == max(mults) and level > len(mults) - 5."""
    if mult == max(channel_mults) and level > len(channel_mults) - 5:
        return dropout
    return 0.0


class Pix2PixUnet(nn.Module):
    out_channels: int = 1
    channel_mults: Sequence[int] = (1, 2, 4, 8, 8, 8, 8, 8)
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        mults = tuple(self.channel_mults)
        h = x.astype(self.dtype)

        # Encoder: bare stem conv, then LeakyReLU->Conv->BN blocks.
        feats = []
        h = Conv(mults[0] * 64, kernel_size=4, stride=2, padding=1,
                 dtype=self.dtype, name="stem")(h)
        feats.append(h)
        for level, mult in enumerate(mults[1:], 1):
            h = EncoderBlock(
                mult * 64,
                norm=level != len(mults) - 1,
                dtype=self.dtype,
                name=f"enc_{level}",
            )(h, train)
            feats.append(h)

        feats.pop()  # innermost feature map is not used as a skip

        # Decoder with skip concatenations ([h, skip] order, pix2pix.py:212).
        for i, (level, mult) in enumerate(
                reversed(list(enumerate(mults[:-1])))):
            if i != 0:
                h = jnp.concatenate([h, feats.pop()], axis=-1)
            h = DecoderBlock(
                mult * 64,
                dropout=dropout_for_level(level, mult, mults, self.dropout),
                dtype=self.dtype,
                name=f"dec_{i}",
            )(h, train)

        h = jnp.concatenate([h, feats.pop()], axis=-1)
        h = ConvTranspose(self.out_channels, kernel_size=4, stride=2,
                          padding=1, dtype=self.dtype, name="head")(h)
        return jnp.tanh(h.astype(jnp.float32))
