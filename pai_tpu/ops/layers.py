"""Thin flax.linen layers with PyTorch-parity numerics, NHWC layout.

These are the building blocks every model family in the framework shares. They
intentionally pin down the exact semantics the reference relies on from torch:

* ``Conv`` — cross-correlation with explicit symmetric padding
  (torch ``nn.Conv2d(k, s, p)``; e.g. reference ``models/pix2pix.py:63-69``).
* ``ConvTranspose`` — exact ``nn.ConvTranspose2d(k=4, s=2, p=1)`` semantics
  (reference ``models/pix2pix.py:99-105``): implemented as an input-dilated
  conv with a spatially-flipped kernel and padding ``k-1-p`` so the output is
  exactly ``2x`` the input — XLA maps this straight onto the MXU.
* ``BatchNorm`` — torch defaults (eps=1e-5, momentum 0.1 -> flax 0.9), always
  computed in float32 regardless of the compute dtype, matching the reference
  float32-upcast norm subclasses (``models/guided_diffusion/nn.py:11-23``).
* ``InstanceNorm`` — torch ``nn.InstanceNorm2d`` default is *unparameterised*
  (affine=False); used by the PatchGAN discriminator
  (``models/wrapper.py:204``).
* ``Dropout2d`` — whole-channel dropout (``models/pix2pix.py:107``): the mask
  broadcasts over H and W.
* ``gamma_embedding`` — sinusoidal embedding of (fractional) noise levels,
  max_period=1e4 (``models/guided_diffusion/nn.py:140-157``).

Weight init matches the reference ``init_weights`` (``models/utils.py:15-28``):
N(0, 0.02) for conv/conv-transpose/linear kernels, ones/zeros for norm
scale/bias. Conv biases are zero-initialised (the reference leaves torch's
default uniform bias untouched; zero init is a documented deviation that does
not affect metric parity targets).
"""

from __future__ import annotations

import math
from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

# The reference initialises GAN-family conv / linear weights as N(0, 0.02)
# (models/utils.py:15-20, applied at wrapper.py:35-37). The Palette model is
# NOT passed through init_weights — it keeps torch's default
# kaiming_uniform(a=sqrt(5)) == U(+-1/sqrt(fan_in)) for both kernel and bias
# — so Conv/Dense take an ``init_mode``: "normal002" (GAN families) or
# "torch" (diffusion UNet).
normal_init = nn.initializers.normal(stddev=0.02)


def torch_kaiming_uniform(key, shape, dtype=jnp.float32):
    """torch nn.Conv2d / nn.Linear default weight init: U(+-1/sqrt(fan_in)),
    fan_in = prod(shape[:-1]) for HWIO kernels and (in, out) dense."""
    import numpy as np

    fan_in = int(np.prod(shape[:-1]))
    bound = 1.0 / math.sqrt(fan_in)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def _torch_bias_init(fan_in: int):
    bound = 1.0 / math.sqrt(fan_in)

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def leaky_relu(x, negative_slope: float = 0.2):
    return jnp.where(x >= 0, x, negative_slope * x)


def silu(x):
    # Reference defines its own SiLU (models/guided_diffusion/unet.py:18-20).
    return x * jax.nn.sigmoid(x)


class Conv(nn.Module):
    """2-D convolution, NHWC, torch ``nn.Conv2d`` semantics.

    ``padding`` is the symmetric spatial padding integer (torch style).
    """

    features: int
    kernel_size: int = 3
    stride: int = 1
    padding: int = 0
    groups: int = 1
    use_bias: bool = True
    init_mode: str = "normal002"  # "normal002" | "torch"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        k = self.kernel_size
        in_ch = x.shape[-1]
        kshape = (k, k, in_ch // self.groups, self.features)
        if self.init_mode == "torch":
            kernel_init = torch_kaiming_uniform
            bias_init = _torch_bias_init(k * k * in_ch // self.groups)
        else:
            kernel_init = normal_init
            bias_init = nn.initializers.zeros
        kernel = self.param("kernel", kernel_init, kshape, jnp.float32)
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype),
            kernel.astype(self.dtype),
            window_strides=(self.stride, self.stride),
            padding=((self.padding, self.padding), (self.padding, self.padding)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=self.groups,
        )
        if self.use_bias:
            bias = self.param("bias", bias_init, (self.features,), jnp.float32)
            y = y + bias.astype(self.dtype)
        return y


class ConvTranspose(nn.Module):
    """Transposed 2-D convolution with exact torch ``ConvTranspose2d`` output
    geometry: ``out = (in - 1) * s - 2p + k``.

    Implemented as ``conv_general_dilated`` with ``lhs_dilation=s`` and
    padding ``k - 1 - p`` on a spatially flipped kernel, which is the
    mathematical identity for transposed convolution and compiles to a single
    MXU conv on TPU (no scatter).
    """

    features: int
    kernel_size: int = 4
    stride: int = 2
    padding: int = 1
    use_bias: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        k = self.kernel_size
        in_ch = x.shape[-1]
        kernel = self.param(
            "kernel", normal_init, (k, k, in_ch, self.features), jnp.float32
        )
        pad = k - 1 - self.padding
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype),
            jnp.flip(kernel, (0, 1)).astype(self.dtype),
            window_strides=(1, 1),
            padding=((pad, pad), (pad, pad)),
            lhs_dilation=(self.stride, self.stride),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        if self.use_bias:
            bias = self.param(
                "bias", nn.initializers.zeros, (self.features,), jnp.float32
            )
            y = y + bias.astype(self.dtype)
        return y


class BatchNorm(nn.Module):
    """Batch normalisation with torch defaults, computed in float32.

    Works on NHWC (normalises over N, H, W) and on NLC token tensors
    (normalises over N, L) — the latter replicates the reference's
    ``BatchNorm1d`` on ``[N, C, T]`` (models/guided_diffusion/nn.py:21-23).

    Deviation from torch (documented): running variance uses the biased
    estimator (flax convention) instead of torch's unbiased running update;
    at parity batch sizes the difference is < 1/N and does not move metrics.
    Under pjit data parallelism the batch axes are *global* (XLA inserts the
    cross-replica reductions), i.e. synced BatchNorm — strictly more correct
    than the reference's single-device stats.
    """

    use_running_average: bool = False
    momentum: float = 0.9  # flax convention == torch momentum 0.1
    epsilon: float = 1e-5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        orig_dtype = x.dtype
        y = nn.BatchNorm(
            use_running_average=self.use_running_average,
            momentum=self.momentum,
            epsilon=self.epsilon,
            dtype=jnp.float32,
            param_dtype=jnp.float32,
        )(x.astype(jnp.float32))
        return y.astype(orig_dtype)


class InstanceNorm(nn.Module):
    """torch ``nn.InstanceNorm2d`` with default affine=False: per-sample,
    per-channel normalisation over spatial dims (reference
    ``models/wrapper.py:204``)."""

    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x):
        orig_dtype = x.dtype
        x32 = x.astype(jnp.float32)
        mean = jnp.mean(x32, axis=(1, 2), keepdims=True)
        var = jnp.var(x32, axis=(1, 2), keepdims=True)
        y = (x32 - mean) * jax.lax.rsqrt(var + self.epsilon)
        return y.astype(orig_dtype)


class Dropout2d(nn.Module):
    """Whole-channel dropout (torch ``nn.Dropout2d``): one Bernoulli draw per
    (sample, channel), broadcast over H, W (reference
    ``models/pix2pix.py:107``)."""

    rate: float

    @nn.compact
    def __call__(self, x, deterministic: bool):
        if self.rate == 0.0:
            return x
        return nn.Dropout(rate=self.rate, broadcast_dims=(1, 2))(
            x, deterministic=deterministic
        )


class Dense(nn.Module):
    """Linear layer. init_mode "normal002" = reference init_weights
    (models/utils.py:15-20); "torch" = torch nn.Linear default (used by the
    diffusion UNet, which the reference never re-initialises)."""

    features: int
    use_bias: bool = True
    init_mode: str = "normal002"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        if self.init_mode == "torch":
            kernel_init = torch_kaiming_uniform
            bias_init = _torch_bias_init(x.shape[-1])
        else:
            kernel_init = normal_init
            bias_init = nn.initializers.zeros
        return nn.Dense(
            self.features,
            use_bias=self.use_bias,
            kernel_init=kernel_init,
            bias_init=bias_init,
            dtype=self.dtype,
            param_dtype=jnp.float32,
        )(x)


class LayerNorm(nn.Module):
    """torch ``nn.LayerNorm`` (eps=1e-5, elementwise affine)."""

    epsilon: float = 1e-5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        orig_dtype = x.dtype
        y = nn.LayerNorm(epsilon=self.epsilon, dtype=jnp.float32,
                         param_dtype=jnp.float32)(x.astype(jnp.float32))
        return y.astype(orig_dtype)


def max_pool_2x(x):
    """torch ``nn.MaxPool2d(2)`` on NHWC (reference models/res_unet.py:199).

    init_value must be a concrete literal so XLA emits the differentiable
    reduce_window_max primitive."""
    import numpy as np

    init = np.array(-np.inf, x.dtype) if jnp.issubdtype(x.dtype, jnp.floating) \
        else np.array(np.iinfo(x.dtype).min, x.dtype)
    return jax.lax.reduce_window(
        x, init, jax.lax.max,
        window_dimensions=(1, 2, 2, 1),
        window_strides=(1, 2, 2, 1),
        padding="VALID",
    )


def avg_pool_2x(x):
    """torch ``nn.AvgPool2d(2)`` on NHWC (guided_diffusion Downsample,
    models/guided_diffusion/unet.py:98)."""
    import numpy as np

    s = jax.lax.reduce_window(
        x, np.array(0, x.dtype), jax.lax.add,
        window_dimensions=(1, 2, 2, 1),
        window_strides=(1, 2, 2, 1),
        padding="VALID",
    )
    return s * jnp.asarray(0.25, x.dtype)


def upsample_nearest_2x(x):
    """torch ``nn.Upsample(scale_factor=2)`` (nearest) on NHWC."""
    x = jnp.repeat(x, 2, axis=1)
    return jnp.repeat(x, 2, axis=2)


def gamma_embedding(gammas, dim: int, max_period: float = 10000.0):
    """Sinusoidal embedding of fractional noise levels, [cos | sin] order,
    zero-padded if ``dim`` is odd (reference
    models/guided_diffusion/nn.py:140-157)."""
    half = dim // 2
    freqs = jnp.exp(
        -math.log(max_period)
        * jnp.arange(half, dtype=jnp.float32) / half
    )
    args = gammas.reshape(-1).astype(jnp.float32)[:, None] * freqs[None]
    emb = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
    if dim % 2:
        emb = jnp.concatenate([emb, jnp.zeros_like(emb[:, :1])], axis=-1)
    return emb
