"""Core neural-net ops with PyTorch-parity semantics, implemented TPU-first.

Everything here is NHWC; convs lower straight onto the MXU via
``lax.conv_general_dilated``.
"""

from pai_tpu.ops.layers import (
    Conv,
    ConvTranspose,
    BatchNorm,
    InstanceNorm,
    Dropout2d,
    Dense,
    LayerNorm,
    max_pool_2x,
    avg_pool_2x,
    upsample_nearest_2x,
    leaky_relu,
    silu,
    gamma_embedding,
)
