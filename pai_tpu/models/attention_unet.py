"""Attention U-Net (Oktay et al. 2018) — Pix2Pix topology with additive
attention gates on every skip connection.

Parity with reference ``models/attention_unet.py``: reuses the Pix2Pix
encoder/decoder blocks (``attention_unet.py:5``); each gate projects the skip
input and the decoder signal with 1x1 conv + BatchNorm, ReLUs their sum, and
produces a single-channel sigmoid mask through another 1x1 conv + BatchNorm
(``attention_unet.py:48-96``); gate channels = skip channels // 2
(``attention_unet.py:168-170``).
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn

from pai_tpu.ops import BatchNorm, Conv, ConvTranspose
from pai_tpu.models.pix2pix import (
    DecoderBlock,
    EncoderBlock,
    dropout_for_level,
)


class AttentionGate(nn.Module):
    attention_channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, signal, train: bool):
        h_input = Conv(self.attention_channels, kernel_size=1,
                       dtype=self.dtype, name="input_gate")(x)
        h_input = BatchNorm(use_running_average=not train)(h_input)
        h_signal = Conv(self.attention_channels, kernel_size=1,
                        dtype=self.dtype, name="signal_gate")(signal)
        h_signal = BatchNorm(use_running_average=not train)(h_signal)
        h = nn.relu(h_signal + h_input)
        att = Conv(1, kernel_size=1, dtype=self.dtype, name="attention")(h)
        att = BatchNorm(use_running_average=not train)(att)
        att = nn.sigmoid(att)
        return x * att


class AttentionUnet(nn.Module):
    out_channels: int = 1
    channel_mults: Sequence[int] = (1, 2, 4, 8, 8, 8, 8, 8)
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        mults = tuple(self.channel_mults)
        h = x.astype(self.dtype)

        feats = []
        h = Conv(mults[0] * 64, kernel_size=4, stride=2, padding=1,
                 dtype=self.dtype, name="stem")(h)
        feats.append(h)
        for level, mult in enumerate(mults[1:], 1):
            h = EncoderBlock(mult * 64, norm=level != len(mults) - 1,
                             dtype=self.dtype, name=f"enc_{level}")(h, train)
            feats.append(h)

        feats.pop()

        # Decoder: gate each popped skip with the current decoder signal,
        # then concatenate [h, gated_skip] (attention_unet.py:200-204).
        for i, (level, mult) in enumerate(
                reversed(list(enumerate(mults[:-1])))):
            if i != 0:
                channels = mults[:-1][::-1][i - 1] * 64
                s = AttentionGate(channels // 2, dtype=self.dtype,
                                  name=f"gate_{i - 1}")(feats.pop(), h, train)
                h = jnp.concatenate([h, s], axis=-1)
            h = DecoderBlock(
                mult * 64,
                dropout=dropout_for_level(level, mult, mults, self.dropout),
                dtype=self.dtype,
                name=f"dec_{i}",
            )(h, train)

        channels = mults[0] * 64
        s = AttentionGate(channels // 2, dtype=self.dtype,
                          name=f"gate_{len(mults) - 2}")(feats.pop(), h, train)
        h = jnp.concatenate([h, s], axis=-1)
        h = ConvTranspose(self.out_channels, kernel_size=4, stride=2,
                          padding=1, dtype=self.dtype, name="head")(h)
        return jnp.tanh(h.astype(jnp.float32))
