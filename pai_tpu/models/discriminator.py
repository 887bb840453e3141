"""PatchGAN discriminator (reference ``models/wrapper.py:176-238``).

Four stride-2 conv blocks (64 -> 128 -> 256 -> 512, k=4, InstanceNorm on all
but the first, LeakyReLU 0.2) plus a final 1-channel k=4 s=1 p=1 conv without
bias producing patch logits. Input is the channel-concatenation of the
condition image and the (real or generated) image.

The reference has a latent bug here: ``Discriminator()`` defaults to
``in_channels=3`` while every generator is built with 1 channel
(``main.py:25-101`` vs ``wrapper.py:34``), which crashes torch on grayscale
data. This rebuild plumbs the generator's channel count through (SURVEY §5.1
quirk 3).
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from pai_tpu.ops import Conv, InstanceNorm, leaky_relu


class DiscriminatorBlock(nn.Module):
    features: int
    norm: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = Conv(self.features, kernel_size=4, stride=2, padding=1,
                 dtype=self.dtype)(x)
        if self.norm:
            h = InstanceNorm()(h)
        return leaky_relu(h, 0.2)


class Discriminator(nn.Module):
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, y):
        h = jnp.concatenate([x, y], axis=-1).astype(self.dtype)
        h = DiscriminatorBlock(64, norm=False, dtype=self.dtype)(h)
        h = DiscriminatorBlock(128, norm=True, dtype=self.dtype)(h)
        h = DiscriminatorBlock(256, norm=True, dtype=self.dtype)(h)
        h = DiscriminatorBlock(512, norm=True, dtype=self.dtype)(h)
        h = Conv(1, kernel_size=4, stride=1, padding=1, use_bias=False,
                 dtype=self.dtype)(h)
        return h.astype(jnp.float32)
