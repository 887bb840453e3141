"""Loss dispatch matching the reference ``models/wrapper.py:42-95``.

* ``gan``:   BCE-with-logits(D(x, pred), 1) + 50 * L1(pred, target)
  (the reference uses weight 50, not the paper's 100 — ``wrapper.py:51``).
* ``ssim``:  -SSIM(denorm(pred), denorm(target))
* ``psnr``:  -PSNR(denorm(pred), denorm(target))
* ``ssim+psnr``: -(30 * SSIM + PSNR) on denormalised images
* ``mse``:   mean squared error on the raw [-1, 1] tensors
* discriminator: BCE(fake -> 0) + BCE(real -> 1)

All reductions are means, computed in float32.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from pai_tpu.utils import metrics
from pai_tpu.utils.images import denormalize

LOSS_TYPES = ("gan", "ssim", "psnr", "ssim+psnr", "mse")


def bce_with_logits(logits, targets):
    """Numerically stable torch F.binary_cross_entropy_with_logits (mean)."""
    logits = logits.astype(jnp.float32)
    neg_abs = -jnp.abs(logits)
    loss = jnp.maximum(logits, 0.0) - logits * targets + jnp.log1p(
        jnp.exp(neg_abs))
    return jnp.mean(loss)


def l1_loss(pred, target):
    return jnp.mean(jnp.abs(pred.astype(jnp.float32) -
                            target.astype(jnp.float32)))


def generator_loss(loss_type: str, pred, target, pred_logits=None):
    """Generator objective (wrapper.py:42-66). For ``gan``, ``pred_logits``
    are the discriminator logits on (condition, pred)."""
    if loss_type == "gan":
        return (bce_with_logits(pred_logits, jnp.ones_like(pred_logits))
                + 50.0 * l1_loss(pred, target))
    dp, dt = denormalize(pred), denormalize(target)
    if loss_type == "ssim":
        return -metrics.ssim(dp, dt)
    if loss_type == "psnr":
        return -metrics.psnr(dp, dt)
    if loss_type == "ssim+psnr":
        return -(30.0 * metrics.ssim(dp, dt) + metrics.psnr(dp, dt))
    if loss_type == "mse":
        return metrics.mse(pred, target)
    raise ValueError(f"unknown loss_type {loss_type}")


def discriminator_loss(pred_logits, target_logits):
    """D objective (wrapper.py:68-95): fakes -> 0, reals -> 1."""
    return (bce_with_logits(pred_logits, jnp.zeros_like(pred_logits))
            + bce_with_logits(target_logits, jnp.ones_like(target_logits)))
