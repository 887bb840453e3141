"""SSIM / PSNR / MSE / RMSE with torchmetrics-0.11 functional semantics.

The reference computes every quality number through torchmetrics functional
metrics with ``data_range=1.0`` (``models/utils.py:38-47``, ``report.py:3-7``):

* SSIM: 11x11 Gaussian window (sigma=1.5), k1=0.01, k2=0.03. torchmetrics
  reflect-pads by 5, runs a *valid* depthwise window so the similarity map is
  full-resolution, and reduces the scalar over the map cropped by the pad on
  each side. ``return_full_image=True`` returns the uncropped map
  (``report.py:78-84``).
* PSNR: ``10 * log10(data_range^2 / mean_sq_err)`` over the whole tensor.
* MSE / RMSE: plain mean squared error; RMSE over the whole set
  (``report.py:146``).

Everything is NHWC and pure jnp, so the same code runs under jit inside the
training step (SSIM/PSNR are *losses* for loss_type ssim|psnr|ssim+psnr,
``models/wrapper.py:53-63``) and on device at report time. The separable
Gaussian blur is two depthwise convs — exactly the outer-product 2-D kernel
torchmetrics uses, but cheaper on the VPU. A fused Pallas variant lives in
``pai_tpu.kernels.ssim_pallas`` with a parity test against this one.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.lru_cache(maxsize=None)
def _gaussian_1d(kernel_size: int = 11, sigma: float = 1.5):
    """torchmetrics _gaussian: dist = arange((1-k)/2, (1+k)/2),
    g ~ exp(-(d/s)^2/2). Returned as a host numpy constant (cache-safe under
    tracing; it is baked into the jaxpr as a literal)."""
    import numpy as np

    dist = np.arange((1 - kernel_size) / 2, (1 + kernel_size) / 2, 1.0,
                     dtype=np.float32)
    g = np.exp(-((dist / sigma) ** 2) / 2.0)
    return g / g.sum()


def _reflect_pad_hw(x, pad: int):
    """Reflection padding on the two spatial dims of NHWC (torch 'reflect')."""
    return jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)), mode="reflect")


@functools.lru_cache(maxsize=None)
def _banded_blur_matrix(n_out: int, kernel_size: int = 11,
                        sigma: float = 1.5):
    """(n_out, n_out + k - 1) banded matrix whose row i holds the Gaussian
    taps at columns i..i+k-1 — a VALID 1-D blur as a dense matmul."""
    import numpy as np

    g = _gaussian_1d(kernel_size, sigma)
    a = np.zeros((n_out, n_out + kernel_size - 1), np.float32)
    for i in range(n_out):
        a[i, i:i + kernel_size] = g
    return a


@functools.lru_cache(maxsize=None)
def _banded_blur_matrix_reflect(n: int, kernel_size: int = 11,
                                sigma: float = 1.5):
    """(n, n) blur matrix with torch 'reflect' padding FOLDED into the
    taps: row i sums the Gaussian over padded coords i..i+k-1, mapping each
    back to its reflected source index. blur(pad_reflect(x)) == A_r @ x —
    no padded copy ever materialises (the fused Pallas SSIM kernel's
    formulation)."""
    import numpy as np

    g = _gaussian_1d(kernel_size, sigma)
    pad = (kernel_size - 1) // 2
    a = np.zeros((n, n), np.float32)
    for i in range(n):
        for k in range(kernel_size):
            src = i + k - pad
            if src < 0:
                src = -src
            elif src >= n:
                src = 2 * (n - 1) - src
            a[i, src] += g[k]
    return a


def _gaussian_blur_valid(x, kernel_size: int = 11, sigma: float = 1.5):
    """Separable Gaussian blur over padded NHWC, VALID windows.

    TPU-first formulation: each 1-D blur is a banded-matrix matmul on the
    MXU (measured 1.5x faster than the depthwise-conv lowering on v5e at
    batch 32 x 256²; identical numerics at HIGHEST precision). x is the
    padded input (H + k - 1, W + k - 1)."""
    hp, wp = x.shape[1], x.shape[2]
    ah = jnp.asarray(_banded_blur_matrix(hp - kernel_size + 1, kernel_size,
                                         sigma), x.dtype)
    aw = jnp.asarray(_banded_blur_matrix(wp - kernel_size + 1, kernel_size,
                                         sigma), x.dtype)
    x = jnp.einsum("oh,nhwc->nowc", ah, x,
                   preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST)
    x = jnp.einsum("nhwc,ow->nhoc", x, aw,
                   preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST)
    return x


def _fused_kernel_dispatch(pred, target, kernel_name: str, want_map: bool):
    """Route (pred, target) -> the named fused Pallas SSIM kernel when it
    can execute here, else return None and the caller keeps the XLA path.

    * single-device process: call the kernel directly (the bench path).
    * multi-device mesh (installed via ``pai_tpu.parallel.context``): wrap
      in ``shard_map`` over the batch/'dp' axis — a bare pallas_call
      carries no GSPMD partitioning spec, so the wrap is what lets dp
      meshes keep the kernel's measured win instead of falling back to
      the XLA formulation. The kernel grid is per-image, so per-shard
      calls compose with no cross-device traffic.

    The kernel module import happens HERE, after the availability check:
    CPU-only callers never pay it, and a jax build whose pallas-TPU module
    cannot import falls back to the working XLA formulation instead of
    raising from every metrics call.
    """
    from pai_tpu.kernels import kernels_available

    if not kernels_available():
        return None
    try:
        from pai_tpu.kernels import ssim_pallas
    except ImportError:
        return None
    fn = getattr(ssim_pallas, kernel_name)
    if jax.device_count() == 1:
        return fn(pred, target)
    from pai_tpu.parallel.context import get_mesh_context

    ctx = get_mesh_context()
    if ctx is None:
        return None
    dp = ctx.mesh.shape.get("dp", 1)
    n = pred.shape[0]
    if dp <= 1 or n % dp:
        return None  # batch unshardable: XLA path shards fine under GSPMD
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    in_spec = P("dp", None, None, None)
    out_spec = (P("dp"), P("dp", None, None, None)) if want_map else P("dp")
    sharded = shard_map(fn, mesh=ctx.mesh, in_specs=(in_spec, in_spec),
                        out_specs=out_spec, check_vma=False)
    return sharded(pred, target)


def ssim_parts(pred, target, data_range: float = 1.0,
               kernel_size: int = 11, sigma: float = 1.5,
               k1: float = 0.01, k2: float = 0.03):
    """Return (per_image_ssim [N], full_image_map [N,H,W,C]).

    Mirrors torchmetrics ``_ssim_update``: reflect-pad by (k-1)//2, valid
    Gaussian windows over the five moment maps, similarity map at full
    resolution, scalar = mean over the map cropped by the pad on every side.

    With default constants this dispatches to the fused Pallas pair kernel
    (reflect padding folded into the banded blur matrices — no padded
    copies; gradients recompute through ``ssim_parts_xla`` below via its
    custom_vjp — the kernel's backward MUST target the XLA function
    directly, never this dispatcher, or the vjp recurses at trace time):
    directly on a single chip, sharded over 'dp' via ``shard_map`` on a
    multi-device mesh (see ``_fused_kernel_dispatch``).
    """
    if (data_range == 1.0 and kernel_size == 11 and sigma == 1.5
            and k1 == 0.01 and k2 == 0.03 and pred.shape[-1] == 1
            and pred.shape[1] > 2 * 5 and pred.shape[2] > 2 * 5):
        out = _fused_kernel_dispatch(pred, target, "ssim_parts_fused",
                                     want_map=True)
        if out is not None:
            return out
    return ssim_parts_xla(pred, target, data_range, kernel_size, sigma,
                          k1, k2)


def ssim_parts_xla(pred, target, data_range: float = 1.0,
                   kernel_size: int = 11, sigma: float = 1.5,
                   k1: float = 0.01, k2: float = 0.03):
    """The pure-XLA formulation (no Pallas dispatch) — the reference
    implementation the kernels' custom_vjp backwards recompute through."""
    pred = pred.astype(jnp.float32)
    target = target.astype(jnp.float32)
    pad = (kernel_size - 1) // 2
    c1 = (k1 * data_range) ** 2
    c2 = (k2 * data_range) ** 2

    p = _reflect_pad_hw(pred, pad)
    t = _reflect_pad_hw(target, pad)
    # Five moment maps blurred in one depthwise conv by stacking on channels.
    stacked = jnp.concatenate([p, t, p * p, t * t, p * t], axis=-1)
    blurred = _gaussian_blur_valid(stacked, kernel_size, sigma)
    c = pred.shape[-1]
    mu_p, mu_t, e_pp, e_tt, e_pt = (
        blurred[..., i * c:(i + 1) * c] for i in range(5)
    )
    mu_p_sq = mu_p * mu_p
    mu_t_sq = mu_t * mu_t
    mu_pt = mu_p * mu_t
    sigma_p = e_pp - mu_p_sq
    sigma_t = e_tt - mu_t_sq
    sigma_pt = e_pt - mu_pt

    full = ((2 * mu_pt + c1) * (2 * sigma_pt + c2)) / (
        (mu_p_sq + mu_t_sq + c1) * (sigma_p + sigma_t + c2)
    )
    interior = full[:, pad:-pad, pad:-pad, :]
    per_image = jnp.mean(interior.reshape(interior.shape[0], -1), axis=-1)
    return per_image, full


def ssim_per_image(pred, target, data_range: float = 1.0):
    """Per-image scalar SSIM. On TPU this takes the fused Pallas kernel
    (one HBM read per image, no padded copies or map materialisation —
    measured 2.7x the XLA formulation at batch 128 x 256²; gradients
    recompute through this XLA path via its custom_vjp). Elsewhere, and
    whenever the full map is needed, the XLA formulation below is the
    reference.

    On a multi-device mesh (installed via ``pai_tpu.parallel.context``)
    the kernel is wrapped in ``shard_map`` over the 'dp' batch axis, so
    dp/tp training steps keep the fused kernel too (see
    ``_fused_kernel_dispatch``)."""
    if (data_range == 1.0 and pred.shape[-1] == 1
            and pred.shape[1] > 2 * 5 and pred.shape[2] > 2 * 5):
        out = _fused_kernel_dispatch(pred, target, "ssim_per_image_fused",
                                     want_map=False)
        if out is not None:
            return out
    per_image, _ = ssim_parts(pred, target, data_range)
    return per_image


def ssim(pred, target, data_range: float = 1.0):
    """Scalar SSIM, torchmetrics default elementwise-mean reduction
    (== mean of per-image means at equal image sizes)."""
    return jnp.mean(ssim_per_image(pred, target, data_range))


def psnr(pred, target, data_range: float = 1.0):
    """Whole-tensor PSNR (torchmetrics default dim=None)."""
    pred = pred.astype(jnp.float32)
    target = target.astype(jnp.float32)
    mse_val = jnp.mean((pred - target) ** 2)
    return 10.0 * jnp.log10(data_range**2 / mse_val)


def psnr_per_image(pred, target, data_range: float = 1.0):
    """Per-image PSNR, matching report.py:88-91 (one psnr() call per image)."""
    pred = pred.astype(jnp.float32)
    target = target.astype(jnp.float32)
    se = (pred - target) ** 2
    mse_val = jnp.mean(se.reshape(se.shape[0], -1), axis=-1)
    return 10.0 * jnp.log10(data_range**2 / mse_val)


def mse(pred, target):
    return jnp.mean((pred.astype(jnp.float32) - target.astype(jnp.float32)) ** 2)


def mse_per_image(pred, target):
    se = (pred.astype(jnp.float32) - target.astype(jnp.float32)) ** 2
    return jnp.mean(se.reshape(se.shape[0], -1), axis=-1)


def rmse(pred, target):
    """torchmetrics mean_squared_error(squared=False) (models/utils.py:46-47)."""
    return jnp.sqrt(mse(pred, target))


def depth_ssim_per_image(preds, targets, num_depths: int = 16):
    """Per-image SSIM over ``num_depths`` horizontal bands (depth axis = H)
    -> [N, bands]. torch.chunk semantics (report.py:202): ceil-sized bands,
    short last. Batch-local, so report generation can stream it."""
    h = preds.shape[1]
    band = -(-h // num_depths)
    cols = []
    for d in range(num_depths):
        sl = slice(d * band, min((d + 1) * band, h))
        if sl.start >= h:
            break
        per_image, _ = ssim_parts(preds[:, sl], targets[:, sl])
        cols.append(per_image)
    return jnp.stack(cols, axis=1)


def depth_ssim(preds, targets, num_depths: int = 16):
    """Mean/std of per-image SSIM over ``num_depths`` horizontal bands,
    mirroring report.py:188-217.

    Returns an array [num_depths, 2] of (mean, std) — std is the unbiased
    (n-1) estimator like torch.std.
    """
    per = depth_ssim_per_image(preds, targets, num_depths)
    mean = jnp.mean(per, axis=0)
    n = per.shape[0]
    std = jnp.sqrt(jnp.sum((per - mean[None, :]) ** 2, axis=0)
                   / jnp.maximum(n - 1, 1))
    return jnp.stack([mean, std], axis=1)
