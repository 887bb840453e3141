"""Fused windowed-SSIM Pallas kernels.

torchmetrics SSIM semantics (SURVEY §2.2: 11x11 Gaussian sigma 1.5,
k1/k2 = 0.01/0.03, reflect pad, full-resolution map, interior-cropped
scalar) as single-pass TPU kernels. Two entry points:

* ``ssim_per_image_fused`` — the SCALAR path (losses, eval metrics,
  checkpoint selection). Key observation: the interior crop removes
  exactly the rows/cols whose windows touch the reflect padding, so the
  scalar needs only VALID windows over the unpadded image. One kernel
  program per image reads the two raw images from HBM ONCE, forms the five
  moment maps in VMEM, blurs them with banded-matrix dots on the MXU, and
  reduces the similarity map to one float — no padded copies, no map
  materialisation, ~2 HBM reads + 1 scalar write per image vs the XLA
  formulation's pad-stack + map round trips. Measured v5e, batch
  128 x 256²: 2.84 ms vs 7.73 ms XLA (2.7x, parity 5e-9; dispatched
  automatically by ``pai_tpu.utils.metrics.ssim_per_image`` on TPU).

* ``ssim_parts_fused`` — the (per_image, full map) pair for report-time
  SSIM images. Reflect padding is FOLDED INTO the banded blur matrices
  (``_banded_blur_matrix_reflect``): blur(pad_reflect(x)) == A_r @ x, so
  the padded copies never materialise here either.

Backward passes recompute through the XLA reference formulation
(``custom_vjp``): SSIM is a loss for loss_type ssim|ssim+psnr
(wrapper.py:53-63), and the recompute keeps gradient numerics bit-identical
to the tested XLA path while the forward still takes the fused kernel.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pai_tpu.kernels import interpret_enabled
from pai_tpu.utils.metrics import (
    _banded_blur_matrix,
    _banded_blur_matrix_reflect,
    ssim_parts_xla,
)

KERNEL = 11
PAD = (KERNEL - 1) // 2


def _round_up(x, m):
    return (x + m - 1) // m * m


def _blur2d(m, ah, aw):
    # HIGHEST precision: full-f32 MXU passes — SSIM ratios amplify the
    # default bf16-pass rounding beyond the 1e-3 parity budget.
    b = jax.lax.dot_general(ah, m, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32,
                            precision=jax.lax.Precision.HIGHEST)
    return jax.lax.dot_general(b, aw, (((1,), (1,)), ((), ())),
                               preferred_element_type=jnp.float32,
                               precision=jax.lax.Precision.HIGHEST)


def _similarity(p, t, ah, aw, c1, c2):
    mu_p = _blur2d(p, ah, aw)
    mu_t = _blur2d(t, ah, aw)
    e_pp = _blur2d(p * p, ah, aw)
    e_tt = _blur2d(t * t, ah, aw)
    e_pt = _blur2d(p * t, ah, aw)

    mu_p_sq = mu_p * mu_p
    mu_t_sq = mu_t * mu_t
    mu_pt = mu_p * mu_t
    sigma_p = e_pp - mu_p_sq
    sigma_t = e_tt - mu_t_sq
    sigma_pt = e_pt - mu_pt

    return ((2 * mu_pt + c1) * (2 * sigma_pt + c2)) / (
        (mu_p_sq + mu_t_sq + c1) * (sigma_p + sigma_t + c2))


def _ssim_map_kernel(p_ref, t_ref, ah_ref, aw_ref, map_ref,
                     *, c1: float, c2: float):
    # p/t: (1, H_AL, W_AL) raw image (zero alignment tail); ah/aw:
    # reflect-folded banded matrices (h, H_AL) / (w, W_AL) — zero taps
    # over the alignment junk, so it never contributes.
    p = p_ref[0].astype(jnp.float32)
    t = t_ref[0].astype(jnp.float32)
    map_ref[0] = _similarity(p, t, ah_ref[:], aw_ref[:], c1, c2)


def _ssim_scalar_kernel(p_ref, t_ref, ah_ref, aw_ref, out_ref,
                        *, c1: float, c2: float):
    # ah/aw: VALID banded matrices (h-2*PAD, H_AL) / (w-2*PAD, W_AL): the
    # interior crop keeps exactly the valid-window positions, so no
    # padding of any kind enters the scalar.
    p = p_ref[0].astype(jnp.float32)
    t = t_ref[0].astype(jnp.float32)
    full = _similarity(p, t, ah_ref[:], aw_ref[:], c1, c2)
    # tile-aligned scalar: (8, 128) is the smallest legal f32 VMEM tile;
    # the caller reads element [0, 0]
    out_ref[0] = jnp.full((8, 128), jnp.mean(full), jnp.float32)


def _aligned_images(pred, target):
    n, h, w, c = pred.shape
    assert c == 1, "fused SSIM kernels are single-channel (grayscale pipeline)"
    h_al, w_al = _round_up(h, 8), _round_up(w, 128)

    def prep(x):
        return jnp.pad(x[..., 0].astype(jnp.float32),
                       ((0, 0), (0, h_al - h), (0, w_al - w)))

    return prep(pred), prep(target), h_al, w_al


def _banded(a, padded_cols):
    return jnp.asarray(np.pad(a, ((0, 0), (0, padded_cols - a.shape[1]))),
                       jnp.float32)


def _fused_forward(pred, target, data_range: float = 1.0,
                   interpret=None):
    """pred/target: (N, H, W, 1) -> (per_image [N], full map [N,H,W,1])."""
    if interpret is None:
        interpret = interpret_enabled()
    n, h, w, _ = pred.shape
    c1 = (0.01 * data_range) ** 2
    c2 = (0.03 * data_range) ** 2
    p, t, h_al, w_al = _aligned_images(pred, target)
    ah = _banded(_banded_blur_matrix_reflect(h, KERNEL, 1.5), h_al)
    aw = _banded(_banded_blur_matrix_reflect(w, KERNEL, 1.5), w_al)

    full = pl.pallas_call(
        functools.partial(_ssim_map_kernel, c1=c1, c2=c2),
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, h_al, w_al), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h_al, w_al), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((h, h_al), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((w, w_al), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, h, w), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, h, w), jnp.float32),
        interpret=interpret,
    )(p, t, ah, aw)
    interior = full[:, PAD:-PAD, PAD:-PAD]
    per_image = jnp.mean(interior.reshape(n, -1), axis=-1)
    return per_image, full[..., None]


def _scalar_forward(pred, target, data_range: float = 1.0,
                    interpret=None):
    """pred/target: (N, H, W, 1) -> per-image interior-mean SSIM [N]."""
    if interpret is None:
        interpret = interpret_enabled()
    n, h, w, _ = pred.shape
    c1 = (0.01 * data_range) ** 2
    c2 = (0.03 * data_range) ** 2
    p, t, h_al, w_al = _aligned_images(pred, target)
    ah = _banded(_banded_blur_matrix(h - 2 * PAD, KERNEL, 1.5), h_al)
    aw = _banded(_banded_blur_matrix(w - 2 * PAD, KERNEL, 1.5), w_al)

    out = pl.pallas_call(
        functools.partial(_ssim_scalar_kernel, c1=c1, c2=c2),
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, h_al, w_al), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h_al, w_al), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((h - 2 * PAD, h_al), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((w - 2 * PAD, w_al), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, 8, 128), jnp.float32),
        interpret=interpret,
    )(p, t, ah, aw)
    return out[:, 0, 0]


@jax.custom_vjp
def ssim_parts_fused(pred, target):
    return _fused_forward(pred, target)


def _fwd(pred, target):
    return _fused_forward(pred, target), (pred, target)


def _bwd(residuals, g):
    pred, target = residuals
    _, vjp_fn = jax.vjp(lambda a, b: ssim_parts_xla(a, b), pred, target)
    return vjp_fn(g)


ssim_parts_fused.defvjp(_fwd, _bwd)


@jax.custom_vjp
def ssim_per_image_fused(pred, target):
    return _scalar_forward(pred, target)


def _sfwd(pred, target):
    return _scalar_forward(pred, target), (pred, target)


def _sbwd(residuals, g):
    pred, target = residuals
    _, vjp_fn = jax.vjp(lambda a, b: ssim_parts_xla(a, b)[0], pred, target)
    return vjp_fn(g)


ssim_per_image_fused.defvjp(_sfwd, _sbwd)
