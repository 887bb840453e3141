"""Embedding-conditioned UNet backbone for Palette diffusion.

Capability parity with reference ``models/guided_diffusion/unet.py``:
* ``cond_embed`` MLP (inner -> 4*inner -> 4*inner, SiLU) over the sinusoidal
  gamma embedding (``unet.py:411-416``, ``unet.py:561``).
* Input / middle / output block lists with per-level FiLM (scale-shift norm)
  ResBlocks (``unet.py:206-210``), attention at configured downsample rates
  (``unet.py:438-447``), ResBlock-based up/downsampling
  (``resblock_updown=True``, ``unet.py:451-469``, ``unet.py:525-540``),
  skip concatenation from every input block (``unet.py:569-571``),
  zero-initialised output convolution (``unet.py:544-548``).
* Norms are BatchNorm (1d/2d), matching the reference's deliberate deviation
  from upstream guided_diffusion GroupNorm
  (``models/guided_diffusion/nn.py:51-68``), computed in float32.
* Attention blocks are rematerialised (``jax.checkpoint``), mirroring the
  always-on gradient checkpointing at ``unet.py:254``; long sequences take
  the blockwise/flash path (see ``pai_tpu.ops.attention``).

The Palette wrapper instantiates this with ``in_channel = 2*C`` (condition
concatenated along channels), ``res_blocks=2``, ``inner_channel=128``,
``num_heads=4`` (``models/palette.py:50-61``).
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from pai_tpu.ops import (
    BatchNorm,
    Conv,
    Dense,
    avg_pool_2x,
    gamma_embedding,
    silu,
    upsample_nearest_2x,
)
from pai_tpu.ops.attention import multihead_attention

zeros_init = nn.initializers.zeros


class ZeroConv(nn.Module):
    """Conv with zero-initialised kernel and bias (guided_diffusion
    ``zero_module``, nn.py:26-33)."""

    features: int
    kernel_size: int = 3
    padding: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        k = self.kernel_size
        kernel = self.param("kernel", zeros_init,
                            (k, k, x.shape[-1], self.features), jnp.float32)
        bias = self.param("bias", zeros_init, (self.features,), jnp.float32)
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype), kernel.astype(self.dtype), (1, 1),
            ((self.padding, self.padding), (self.padding, self.padding)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return y + bias.astype(self.dtype)


class ResBlock(nn.Module):
    """FiLM-conditioned residual block with optional up/down sampling
    (unet.py:105-214, use_scale_shift_norm=True)."""

    out_channels: int
    dropout: float = 0.0
    up: bool = False
    down: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, emb, train: bool):
        in_ch = x.shape[-1]

        h = BatchNorm(use_running_average=not train, name="norm_in")(x)
        h = silu(h)
        if self.up:
            h = upsample_nearest_2x(h)
            x = upsample_nearest_2x(x)
        elif self.down:
            h = avg_pool_2x(h)
            x = avg_pool_2x(x)
        h = Conv(self.out_channels, 3, padding=1, init_mode="torch",
                 dtype=self.dtype, name="conv_in")(h)

        # FiLM: scale-shift from the embedding (unet.py:206-210).
        emb_out = Dense(2 * self.out_channels, init_mode="torch",
                        dtype=self.dtype, name="emb_proj")(silu(emb))
        scale, shift = jnp.split(emb_out[:, None, None, :], 2, axis=-1)

        h = BatchNorm(use_running_average=not train, name="norm_out")(h)
        h = h * (1 + scale) + shift
        h = silu(h)
        h = nn.Dropout(self.dropout)(h, deterministic=not train)
        h = ZeroConv(self.out_channels, 3, 1, dtype=self.dtype,
                     name="conv_out")(h)

        if in_ch != self.out_channels:
            x = Conv(self.out_channels, 1, init_mode="torch",
                     dtype=self.dtype, name="skip")(x)
        return x + h


class AttentionBlock(nn.Module):
    """Spatial self-attention with BatchNorm1d pre-norm and zero-init output
    projection (unet.py:217-262 with the nn.py:51-58 BatchNorm deviation).

    The norm's momentum is 0.81 = 0.9², not 0.9: the reference wraps every
    attention block in ALWAYS-ON gradient checkpointing (unet.py:253-254,
    nn.py CheckpointFunction), whose backward re-runs ``_forward`` with the
    module still in train mode — so each reference training step updates
    this BatchNorm1d's running stats TWICE with the same batch statistics,
    i.e. r <- 0.9²·r + (1-0.9²)·m. Discovered by the production-width pin
    (tests/test_width_parity.py); one composed update replicates it
    exactly."""

    num_heads: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        n, hh, ww, c = x.shape
        tokens = x.reshape(n, hh * ww, c)

        h = BatchNorm(use_running_average=not train, momentum=0.81,
                      name="norm")(tokens)
        qkv = Dense(3 * c, init_mode="torch", dtype=self.dtype,
                    name="qkv")(h)
        qkv = qkv.reshape(n, hh * ww, self.num_heads, 3,
                          c // self.num_heads)
        q = qkv[:, :, :, 0].transpose(0, 2, 1, 3)
        k = qkv[:, :, :, 1].transpose(0, 2, 1, 3)
        v = qkv[:, :, :, 2].transpose(0, 2, 1, 3)

        # Rematerialised, mirroring the always-on gradient checkpointing of
        # the reference attention blocks (unet.py:254).
        a = jax.checkpoint(
            lambda q_, k_, v_: multihead_attention(q_, k_, v_))(q, k, v)
        a = a.transpose(0, 2, 1, 3).reshape(n, hh * ww, c)

        proj = nn.Dense(c, kernel_init=zeros_init, bias_init=zeros_init,
                        dtype=self.dtype, param_dtype=jnp.float32,
                        name="proj")(a)
        return (tokens + proj).reshape(n, hh, ww, c)


class DiffusionUNet(nn.Module):
    in_channels: int = 2
    out_channels: int = 1
    inner_channel: int = 128
    res_blocks: int = 2
    channel_mults: Sequence[int] = (1, 2, 4, 8, 8, 8, 8, 8)
    attn_res: Sequence[int] = (8, 4, 2)
    num_heads: int = 4
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, y, gammas, train: bool = False):
        """x: condition [N,H,W,C]; y: noisy image [N,H,W,C]; gammas: [N]."""
        mults = tuple(self.channel_mults)
        attn_res = set(self.attn_res)
        inner = self.inner_channel

        emb = gamma_embedding(gammas, inner)
        emb = Dense(4 * inner, init_mode="torch", dtype=self.dtype,
                    name="cond_embed_0")(emb)
        emb = silu(emb)
        emb = Dense(4 * inner, init_mode="torch", dtype=self.dtype,
                    name="cond_embed_1")(emb)

        h = jnp.concatenate([x, y], axis=-1).astype(self.dtype)

        # ---- input blocks (unet.py:418-473) ----
        ch = input_ch = mults[0] * inner
        h = Conv(ch, 3, padding=1, init_mode="torch",
                 dtype=self.dtype, name="in_conv")(h)
        hs = [h]
        blk = 0
        ds = 1
        for level, mult in enumerate(mults):
            for _ in range(self.res_blocks):
                h = ResBlock(mult * inner, self.dropout, dtype=self.dtype,
                             name=f"in_res_{blk}")(h, emb, train)
                ch = mult * inner
                if ds in attn_res:
                    h = AttentionBlock(self.num_heads, dtype=self.dtype,
                                       name=f"in_attn_{blk}")(h, train)
                hs.append(h)
                blk += 1
            if level != len(mults) - 1:
                h = ResBlock(ch, self.dropout, down=True, dtype=self.dtype,
                             name=f"down_{level}")(h, emb, train)
                hs.append(h)
                ds *= 2

        # ---- middle (unet.py:475-497) ----
        h = ResBlock(ch, self.dropout, dtype=self.dtype,
                     name="mid_res_0")(h, emb, train)
        h = AttentionBlock(self.num_heads, dtype=self.dtype,
                           name="mid_attn")(h, train)
        h = ResBlock(ch, self.dropout, dtype=self.dtype,
                     name="mid_res_1")(h, emb, train)

        # ---- output blocks (unet.py:500-542) ----
        blk = 0
        for level, mult in reversed(list(enumerate(mults))):
            for i in range(self.res_blocks + 1):
                skip = hs.pop()
                h = jnp.concatenate([h, skip], axis=-1)
                h = ResBlock(mult * inner, self.dropout, dtype=self.dtype,
                             name=f"out_res_{blk}")(h, emb, train)
                ch = mult * inner
                if ds in attn_res:
                    h = AttentionBlock(self.num_heads, dtype=self.dtype,
                                       name=f"out_attn_{blk}")(h, train)
                if level and i == self.res_blocks:
                    h = ResBlock(ch, self.dropout, up=True, dtype=self.dtype,
                                 name=f"up_{level}")(h, emb, train)
                    ds //= 2
                blk += 1

        # ---- head (unet.py:544-548) ----
        h = BatchNorm(use_running_average=not train, name="out_norm")(h)
        h = silu(h)
        h = ZeroConv(self.out_channels, 3, 1, dtype=self.dtype,
                     name="out_conv")(h)
        return h.astype(jnp.float32)
