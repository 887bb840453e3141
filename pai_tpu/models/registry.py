"""CLI-name -> model builder registry, mirroring ``main.py:23-104``.

Every generator is built with ``in_channels=1, out_channels=1`` by the train
CLI (grayscale photoacoustic data); the modules themselves are channel-count
agnostic.
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp

from pai_tpu.models.pix2pix import Pix2PixUnet
from pai_tpu.models.attention_unet import AttentionUnet
from pai_tpu.models.res_unet import ResUnet
from pai_tpu.models.trans_unet import TransUnet
from pai_tpu.models.diffusion_unet import DiffusionUNet

GENERATOR_NAMES = (
    "pix2pix",
    "attention_unet",
    "res18_unet",
    "res50_unet",
    "resv2_unet",
    "resnext_unet",
    "trans_unet",
    "palette",
)

_RES_TYPES = {
    "res18_unet": "18",
    "res50_unet": "50",
    "resv2_unet": "v2",
    "resnext_unet": "next",
}


def build_generator(
    name: str,
    in_channels: int = 1,
    out_channels: int = 1,
    channel_mults: Sequence[int] = (1, 2, 4, 8, 8, 8, 8, 8),
    attention_res: Sequence[int] = (8, 4, 2),
    dropout: float = 0.0,
    learn_var: bool = False,
    image_size: int = 256,
    dtype: jnp.dtype = jnp.float32,
):
    """Return the generator module for a CLI model name.

    For "palette" this is the conditioned DiffusionUNet with in_channel=2*C
    and out_channel=2*C when learning the variance (palette.py:50-61); all
    others are plain image->image U-Nets.
    """
    mults = tuple(channel_mults)
    if name == "pix2pix":
        return Pix2PixUnet(out_channels=out_channels, channel_mults=mults,
                           dropout=dropout, dtype=dtype)
    if name == "attention_unet":
        return AttentionUnet(out_channels=out_channels, channel_mults=mults,
                             dropout=dropout, dtype=dtype)
    if name in _RES_TYPES:
        return ResUnet(out_channels=out_channels, res_type=_RES_TYPES[name],
                       channel_mults=mults, dropout=dropout, dtype=dtype)
    if name == "trans_unet":
        model = TransUnet(out_channels=out_channels, image_size=image_size,
                          channel_mults=mults, patch_size=4, num_heads=8,
                          dropout=dropout, dtype=dtype)
        model.validate()
        return model
    if name == "palette":
        return DiffusionUNet(
            in_channels=in_channels * 2,
            out_channels=out_channels * 2 if learn_var else out_channels,
            inner_channel=128,
            res_blocks=2,
            channel_mults=mults,
            attn_res=tuple(attention_res),
            num_heads=4,
            dropout=dropout,
            dtype=dtype,
        )
    raise ValueError(f"Incorrect model name ({name})")
