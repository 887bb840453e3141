"""Loss-dispatch golden tests vs torch (wrapper.py:42-95 semantics)."""

import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

from pai_tpu.train import losses  # noqa: E402
from pai_tpu.utils.images import denormalize  # noqa: E402


def _rand(shape, seed):
    return np.random.default_rng(seed).normal(size=shape).astype(np.float32)


def test_bce_with_logits_matches_torch():
    logits = _rand((4, 3, 3, 1), 0)
    for target in (np.zeros_like(logits), np.ones_like(logits)):
        expected = F.binary_cross_entropy_with_logits(
            torch.from_numpy(logits), torch.from_numpy(target)).item()
        got = float(losses.bce_with_logits(jnp.asarray(logits),
                                           jnp.asarray(target)))
        assert got == pytest.approx(expected, rel=1e-5)


def test_gan_generator_loss_weighting():
    """gan loss = BCE(D(pred), 1) + 50 * L1 (wrapper.py:51 — weight 50,
    not the paper's 100)."""
    pred = _rand((2, 8, 8, 1), 1)
    target = _rand((2, 8, 8, 1), 2)
    logits = _rand((2, 3, 3, 1), 3)
    expected = (
        F.binary_cross_entropy_with_logits(
            torch.from_numpy(logits),
            torch.ones_like(torch.from_numpy(logits))).item()
        + 50.0 * F.l1_loss(torch.from_numpy(pred),
                           torch.from_numpy(target)).item())
    got = float(losses.generator_loss(
        "gan", jnp.asarray(pred), jnp.asarray(target), jnp.asarray(logits)))
    assert got == pytest.approx(expected, rel=1e-5)


def test_discriminator_loss():
    fake = _rand((2, 3, 3, 1), 4)
    real = _rand((2, 3, 3, 1), 5)
    expected = (
        F.binary_cross_entropy_with_logits(
            torch.from_numpy(fake), torch.zeros_like(torch.from_numpy(fake)))
        + F.binary_cross_entropy_with_logits(
            torch.from_numpy(real), torch.ones_like(torch.from_numpy(real)))
    ).item()
    got = float(losses.discriminator_loss(jnp.asarray(fake),
                                          jnp.asarray(real)))
    assert got == pytest.approx(expected, rel=1e-5)


def test_mse_loss_on_raw_tensors():
    pred = _rand((2, 8, 8, 1), 6)
    target = _rand((2, 8, 8, 1), 7)
    expected = F.mse_loss(torch.from_numpy(pred),
                          torch.from_numpy(target)).item()
    got = float(losses.generator_loss("mse", jnp.asarray(pred),
                                      jnp.asarray(target)))
    assert got == pytest.approx(expected, rel=1e-5)


def test_ssim_psnr_combo_on_denormalized():
    """ssim+psnr = -(30*SSIM + PSNR) computed on denormalised images
    (wrapper.py:59-63)."""
    from pai_tpu.utils import metrics

    rng = np.random.default_rng(8)
    pred = np.clip(rng.normal(0, 0.5, (2, 32, 32, 1)), -1, 1).astype(np.float32)
    target = np.clip(pred + rng.normal(0, 0.1, pred.shape), -1, 1).astype(
        np.float32)
    pj, tj = jnp.asarray(pred), jnp.asarray(target)
    dp, dt = denormalize(pj), denormalize(tj)
    expected = -(30.0 * float(metrics.ssim(dp, dt))
                 + float(metrics.psnr(dp, dt)))
    got = float(losses.generator_loss("ssim+psnr", pj, tj))
    assert got == pytest.approx(expected, rel=1e-5)
    # and the single-metric variants
    assert float(losses.generator_loss("ssim", pj, tj)) == pytest.approx(
        -float(metrics.ssim(dp, dt)), rel=1e-5)
    assert float(losses.generator_loss("psnr", pj, tj)) == pytest.approx(
        -float(metrics.psnr(dp, dt)), rel=1e-5)
