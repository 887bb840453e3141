"""TransUNet: ResNet-50-style strided conv encoder + ViT bottleneck + conv
decoder (reference ``models/trans_unet.py``).

* Encoder blocks are stride-2 bottleneck residual blocks (1x1 -> 3x3 s2 ->
  1x1, all bias-free + BatchNorm, 1x1 s2 projection skip,
  ``trans_unet.py:178-227``).
* ViT bottleneck: patchify (p=4 from the CLI, ``main.py:97``), LayerNorm ->
  Linear(patch_dim, patch_dim) -> LayerNorm, learned N(0,1) positional
  embedding, 12 post-LN transformer layers (8 heads, GELU, ffn 2048 — torch
  ``nn.TransformerEncoderLayer`` defaults), un-patchify
  (``trans_unet.py:120-175``).
* Decoder blocks: two 3x3 conv + BN + ReLU, then nearest 2x upsample
  (``trans_unet.py:230-255``); skips as in pix2pix; 3x3 conv + tanh head.

Documented deviation: the reference feeds ``(N, patches, dim)`` into a torch
TransformerEncoder built without ``batch_first=True`` (``trans_unet.py:151-161``),
so torch silently attends across the *batch* axis. This rebuild implements the
intended semantics — self-attention across patches within each sample.

Validates mults-vs-patch-size compatibility at build (SURVEY §5.1 quirk 5:
the 8-level CLI default collapses the bottleneck to 1x1, which cannot be
patchified with p=4 — the reference crashes there too).
"""

from __future__ import annotations

import math
from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from pai_tpu.ops import (
    BatchNorm,
    Conv,
    Dense,
    LayerNorm,
    upsample_nearest_2x,
)


class BottleneckDown(nn.Module):
    """Stride-2 ResNet-50-style encoder block (trans_unet.py:178-227)."""

    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        bottleneck = x.shape[-1] // 4
        h = Conv(bottleneck, 1, use_bias=False, dtype=self.dtype)(x)
        h = BatchNorm(use_running_average=not train)(h)
        h = nn.relu(h)
        h = Conv(bottleneck, 3, stride=2, padding=1, use_bias=False,
                 dtype=self.dtype)(h)
        h = BatchNorm(use_running_average=not train)(h)
        h = nn.relu(h)
        h = Conv(self.features, 1, use_bias=False, dtype=self.dtype)(h)
        h = BatchNorm(use_running_average=not train)(h)

        skip = Conv(self.features, 1, stride=2, use_bias=False,
                    dtype=self.dtype)(x)
        skip = BatchNorm(use_running_average=not train)(skip)
        return nn.relu(h + skip)


class TransformerLayer(nn.Module):
    """Post-LN torch ``nn.TransformerEncoderLayer`` (gelu, ffn 2048)."""

    num_heads: int = 8
    ffn_dim: int = 2048
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        n, t, d = x.shape
        head_dim = d // self.num_heads

        qkv = Dense(3 * d, dtype=self.dtype, name="in_proj")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def heads(a):
            return a.reshape(n, t, self.num_heads, head_dim).transpose(
                0, 2, 1, 3)

        q, k, v = heads(q), heads(k), heads(v)
        logits = jnp.einsum("nhqd,nhkd->nhqk", q, k,
                            preferred_element_type=jnp.float32)
        logits = logits / math.sqrt(head_dim)
        weights = jax.nn.softmax(logits, axis=-1)
        weights = nn.Dropout(self.dropout)(
            weights.astype(self.dtype), deterministic=not train)
        attn = jnp.einsum("nhqk,nhkd->nhqd", weights, v,
                          preferred_element_type=jnp.float32)
        attn = attn.transpose(0, 2, 1, 3).reshape(n, t, d).astype(self.dtype)
        attn = Dense(d, dtype=self.dtype, name="out_proj")(attn)
        attn = nn.Dropout(self.dropout)(attn, deterministic=not train)
        x = LayerNorm(dtype=self.dtype)(x + attn)

        h = Dense(self.ffn_dim, dtype=self.dtype, name="ffn1")(x)
        h = nn.gelu(h, approximate=False)
        h = nn.Dropout(self.dropout)(h, deterministic=not train)
        h = Dense(d, dtype=self.dtype, name="ffn2")(h)
        h = nn.Dropout(self.dropout)(h, deterministic=not train)
        return LayerNorm(dtype=self.dtype)(x + h)


class VisionTransformer(nn.Module):
    patch_size: int = 4
    num_heads: int = 8
    dropout: float = 0.0
    num_layers: int = 12
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        n, hh, ww, c = x.shape
        p = self.patch_size
        gh, gw = hh // p, ww // p
        patch_dim = c * p * p

        # n (h p1) (w p2) c -> n (h w) (p1 p2 c)  [matches the einops
        # Rearrange at trans_unet.py:137-141 with channel-last layout]
        h = x.reshape(n, gh, p, gw, p, c).transpose(0, 1, 3, 2, 4, 5)
        h = h.reshape(n, gh * gw, patch_dim)

        h = LayerNorm(dtype=self.dtype)(h)
        h = Dense(patch_dim, dtype=self.dtype)(h)
        h = LayerNorm(dtype=self.dtype)(h)

        pos = self.param("pos_embedding", nn.initializers.normal(stddev=1.0),
                         (1, gh * gw, patch_dim), jnp.float32)
        h = h + pos.astype(h.dtype)

        for i in range(self.num_layers):
            h = TransformerLayer(self.num_heads, 2048, self.dropout,
                                 dtype=self.dtype, name=f"layer_{i}")(h, train)

        h = h.reshape(n, gh, gw, p, p, c).transpose(0, 1, 3, 2, 4, 5)
        return h.reshape(n, hh, ww, c)


class ConvDecoderBlock(nn.Module):
    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        h = Conv(self.features, 3, padding=1, dtype=self.dtype)(x)
        h = BatchNorm(use_running_average=not train)(h)
        h = nn.relu(h)
        h = Conv(self.features, 3, padding=1, dtype=self.dtype)(h)
        h = BatchNorm(use_running_average=not train)(h)
        h = nn.relu(h)
        return upsample_nearest_2x(h)


class TransUnet(nn.Module):
    out_channels: int = 1
    image_size: int = 256
    channel_mults: Sequence[int] = (1, 2, 2, 4, 4)
    patch_size: int = 4
    num_heads: int = 8
    dropout: float = 0.0
    vit_layers: int = 12
    dtype: jnp.dtype = jnp.float32

    def validate(self):
        bott = self.image_size // (2 ** len(self.channel_mults))
        if bott < self.patch_size or bott % self.patch_size:
            raise ValueError(
                f"TransUnet bottleneck size {bott} (image {self.image_size}, "
                f"{len(self.channel_mults)} levels) is incompatible with "
                f"patch_size={self.patch_size}; use e.g. --channel-mults "
                f"1,2,2,4,4 (the reference crashes on this too, "
                f"trans_unet.py:77)")

    @nn.compact
    def __call__(self, x, train: bool = False):
        self.validate()
        mults = tuple(self.channel_mults)
        h = Conv(64, 3, padding=1, dtype=self.dtype, name="stem")(
            x.astype(self.dtype))

        skips = []
        for level, mult in enumerate(mults):
            h = BottleneckDown(mult * 64, dtype=self.dtype,
                               name=f"enc_{level}")(h, train)
            skips.append(h)
        skips.pop()

        h = VisionTransformer(self.patch_size, self.num_heads, self.dropout,
                              num_layers=self.vit_layers,
                              dtype=self.dtype, name="vit")(h, train)

        for i, mult in enumerate(reversed(mults[:-1])):
            if i != 0:
                h = jnp.concatenate([h, skips.pop()], axis=-1)
            h = ConvDecoderBlock(mult * 64, dtype=self.dtype,
                                 name=f"dec_{i}")(h, train)

        if skips:  # single-level configs have no remaining skip
            h = jnp.concatenate([h, skips.pop()], axis=-1)
        h = ConvDecoderBlock(64, dtype=self.dtype, name="dec_final")(h, train)

        h = Conv(self.out_channels, 3, padding=1, dtype=self.dtype,
                 name="head")(h)
        return jnp.tanh(h.astype(jnp.float32))
