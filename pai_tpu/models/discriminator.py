"""PatchGAN discriminator (reference ``models/wrapper.py:176-238``).

Four stride-2 conv blocks (64 -> 128 -> 256 -> 512, k=4, LeakyReLU 0.2) plus
a final 1-channel k=4 s=1 p=1 conv without bias producing patch logits.
Input is the channel-concatenation of the condition image and the (real or
generated) image.

Normalisation quirk (verified against the reference operator chain via
tests/test_forward_parity.py): ``DiscriminatorBlock``'s ``norm`` parameter
defaults to **False** (``wrapper.py:192``) and the ``Discriminator`` never
passes ``norm=True`` (``wrapper.py:228-233``), so the reference PatchGAN has
*no* InstanceNorm anywhere — despite the block defining one. Replicated
exactly; ``use_norm=True`` opts into the standard pix2pix InstanceNorm
variant.

The reference also has a latent channel bug: ``Discriminator()`` defaults to
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
    use_norm: bool = False  # reference behavior: no InstanceNorm (see above)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, y):
        h = jnp.concatenate([x, y], axis=-1).astype(self.dtype)
        h = DiscriminatorBlock(64, norm=False, dtype=self.dtype)(h)
        h = DiscriminatorBlock(128, norm=self.use_norm, dtype=self.dtype)(h)
        h = DiscriminatorBlock(256, norm=self.use_norm, dtype=self.dtype)(h)
        h = DiscriminatorBlock(512, norm=self.use_norm, dtype=self.dtype)(h)
        h = Conv(1, kernel_size=4, stride=1, padding=1, use_bias=False,
                 dtype=self.dtype)(h)
        return h.astype(jnp.float32)
