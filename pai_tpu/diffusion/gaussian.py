"""Gaussian diffusion distributions (reference ``models/palette.py:214-427``).

All functions are pure and shape-polymorphic over NHWC image batches with a
per-sample integer step ``t`` [N]; they run unchanged under ``jit`` inside the
training step and inside the ``lax.scan`` sampler.

Semantics pinned to the reference:
* q-sample draws the noise level *continuously*: gamma ~ U[gamma_{t-1},
  gamma_t] per sample (SR3/WaveGrad-style), with the noise zeroed at t=0
  (``palette.py:214-231``).
* ``p_mean_variance`` predicts x0 from the noise estimate, clamps it to
  [-1, 1], and (optionally) interpolates log-variance between the posterior
  lower bound and log(beta_t) using the model's variance channel mapped from
  [-1,1] to [0,1] (``palette.py:271-306``).
* The VLB term is a KL in bits for t>0 and a discretised-Gaussian NLL at t=0,
  with the mean prediction detached so the variance head cannot shift the
  mean (``palette.py:308-333``).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from pai_tpu.diffusion.schedule import DiffusionSchedule


def _bcast(values, t):
    """values[t] broadcast over image dims: [N] -> [N,1,1,1]
    (palette.py:335-345)."""
    return values[t].reshape(-1, 1, 1, 1)


def q_sample(sched: DiffusionSchedule, y_0, t, rng, noise=None, u=None):
    """Noising forward process (palette.py:214-231).

    Returns (y_t, noise, gamma[N]). gamma is sampled uniformly from
    [gamma_{t-1}, gamma_t]; noise is zeroed where t == 0. ``noise`` (raw,
    pre-mask) and ``u`` may be supplied for deterministic replay (the
    cross-framework parity harness feeds both sides the same stream).
    """
    rng_noise, rng_gamma = (None, None) if rng is None else \
        jax.random.split(rng)
    if noise is None:
        noise = jax.random.normal(rng_noise, y_0.shape, jnp.float32)
    noise = noise * (t > 0).reshape(-1, 1, 1, 1)
    gamma_prev = _bcast(sched.gammas_prev, t)
    gamma_cur = _bcast(sched.gammas, t)
    if u is None:
        u = jax.random.uniform(rng_gamma, gamma_cur.shape, jnp.float32)
    else:
        u = u.reshape(gamma_cur.shape)
    gamma = (gamma_cur - gamma_prev) * u + gamma_prev
    y_t = jnp.sqrt(gamma) * y_0 + jnp.sqrt(1.0 - gamma) * noise
    return y_t, noise, gamma.reshape(-1)


def q_mean_variance(sched: DiffusionSchedule, y_0, y_t, t):
    """Posterior q(y_{t-1} | y_t, y_0) (palette.py:254-269)."""
    alpha = _bcast(sched.alphas, t)
    gamma = _bcast(sched.gammas, t)
    gamma_prev = _bcast(sched.gammas_prev, t)
    mean = (
        (jnp.sqrt(gamma_prev) * (1 - alpha) / (1 - gamma)) * y_0
        + (jnp.sqrt(alpha) * (1 - gamma_prev) / (1 - gamma)) * y_t
    )
    var_lb = (1 - alpha) * (1 - gamma_prev) / (1 - gamma)
    log_variance = jnp.log(jnp.maximum(var_lb, 1e-20))
    return mean, log_variance


def p_mean_variance(sched: DiffusionSchedule, model_output, y_t, t,
                    learn_var: bool):
    """Model reverse distribution p(y_{t-1} | y_t) (palette.py:271-306)."""
    alpha = _bcast(sched.alphas, t)
    gamma = _bcast(sched.gammas, t)
    gamma_prev = _bcast(sched.gammas_prev, t)

    if learn_var:
        c = y_t.shape[-1]
        noise_pred = model_output[..., :c]
        var_interp = (model_output[..., c:] + 1.0) / 2.0
    else:
        noise_pred = model_output
        var_interp = 0.0

    var_lb = jnp.maximum((1 - alpha) * (1 - gamma_prev) / (1 - gamma), 1e-20)
    var_ub = 1 - alpha
    log_variance = (
        var_interp * jnp.log(var_ub) + (1 - var_interp) * jnp.log(var_lb)
    )

    y_0_hat = (y_t - jnp.sqrt(1 - gamma) * noise_pred) / jnp.sqrt(gamma)
    y_0_hat = jnp.clip(y_0_hat, -1.0, 1.0)

    mean = (
        (jnp.sqrt(gamma_prev) * (1 - alpha) / (1 - gamma)) * y_0_hat
        + (jnp.sqrt(alpha) * (1 - gamma_prev) / (1 - gamma)) * y_t
    )
    return mean, log_variance


def normal_kl(mean1, log_var1, mean2, log_var2):
    """KL between diagonal Gaussians (palette.py:368-383)."""
    return 0.5 * (
        -1.0
        + (log_var2 - log_var1)
        + jnp.exp(log_var1 - log_var2)
        + ((mean1 - mean2) ** 2) * jnp.exp(-log_var2)
    )


def approx_standard_normal_cdf(x):
    """tanh approximation of the standard normal CDF (palette.py:386-393)."""
    return 0.5 * (
        1.0 + jnp.tanh(math.sqrt(2.0 / math.pi) * (x + 0.044715 * x**3))
    )


def discretized_gaussian_log_likelihood(x, *, means, log_scales):
    """Log-likelihood of a Gaussian discretised to +-1/255 image bins
    (palette.py:396-427)."""
    centered_x = x - means
    inv_stdv = jnp.exp(-log_scales)
    plus_in = inv_stdv * (centered_x + 1.0 / 255.0)
    cdf_plus = approx_standard_normal_cdf(plus_in)
    min_in = inv_stdv * (centered_x - 1.0 / 255.0)
    cdf_min = approx_standard_normal_cdf(min_in)
    log_cdf_plus = jnp.log(jnp.maximum(cdf_plus, 1e-12))
    log_one_minus_cdf_min = jnp.log(jnp.maximum(1.0 - cdf_min, 1e-12))
    cdf_delta = cdf_plus - cdf_min
    return jnp.where(
        x < -0.999,
        log_cdf_plus,
        jnp.where(
            x > 0.999,
            log_one_minus_cdf_min,
            jnp.log(jnp.maximum(cdf_delta, 1e-12)),
        ),
    )


def vlb_term(sched: DiffusionSchedule, model_output, y_0, y_t, t,
             learn_var: bool):
    """Per-sample VLB term in bits (palette.py:308-333): KL for t>0,
    discretised NLL at t=0; mean prediction detached when learning the
    variance so only the variance channels receive this gradient."""
    if learn_var:
        c = y_t.shape[-1]
        noise_pred = jax.lax.stop_gradient(model_output[..., :c])
        model_output = jnp.concatenate(
            [noise_pred, model_output[..., c:]], axis=-1)

    true_mean, true_log_var = q_mean_variance(sched, y_0, y_t, t)
    pred_mean, pred_log_var = p_mean_variance(
        sched, model_output, y_t, t, learn_var)

    kl = normal_kl(true_mean, true_log_var, pred_mean, pred_log_var)
    kl = jnp.mean(kl.reshape(kl.shape[0], -1), axis=-1) / math.log(2.0)

    nll = -discretized_gaussian_log_likelihood(
        y_0, means=pred_mean, log_scales=0.5 * pred_log_var)
    nll = jnp.mean(nll.reshape(nll.shape[0], -1), axis=-1) / math.log(2.0)

    return jnp.where(t == 0, nll, kl)
