"""Golden tests for the DDPM math against independently scripted numpy
oracles of the reference formulas (SURVEY §4 parity oracles:
palette.py:214-427 schedules, q/p distributions, VLB, likelihoods)."""

import math

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pai_tpu.diffusion import (
    make_schedule,
    linear_beta_schedule,
    cosine_beta_schedule,
    q_sample,
    q_mean_variance,
    p_mean_variance,
    vlb_term,
    normal_kl,
    discretized_gaussian_log_likelihood,
    ddpm_sample,
)


def test_linear_schedule_values():
    betas = linear_beta_schedule(2000, 1e-6, 0.01)
    assert betas[0] == pytest.approx(1e-6)
    assert betas[-1] == pytest.approx(0.01)
    assert len(betas) == 2000
    assert np.all(np.diff(betas) > 0)


def test_cosine_schedule_matches_formula():
    """Reference cosine uses cos WITHOUT squaring and clamps to
    [1e-4, 0.9999] (palette.py:348-357) — pin that exact variant."""
    T = 100
    x = np.linspace(0, T, T + 1)
    g = np.cos((np.pi / 2) * ((x / T) + 0.008) / 1.008)
    g = g / g[0]
    expected = np.clip(1 - g[1:] / g[:-1], 0.0001, 0.9999)
    got = cosine_beta_schedule(T)
    np.testing.assert_allclose(got, expected, rtol=1e-10)


def test_schedule_buffers():
    sched = make_schedule("linear", 10, 0.1, 0.2)
    betas = np.linspace(0.1, 0.2, 10)
    np.testing.assert_allclose(np.asarray(sched.alphas), 1 - betas, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(sched.gammas),
                               np.cumprod(1 - betas), rtol=1e-6)
    assert float(sched.gammas_prev[0]) == 1.0
    np.testing.assert_allclose(np.asarray(sched.gammas_prev[1:]),
                               np.asarray(sched.gammas[:-1]))


def test_q_sample_bounds_and_t0():
    sched = make_schedule("linear", 100, 1e-4, 0.02)
    y0 = jnp.ones((4, 8, 8, 1))
    t = jnp.array([0, 1, 50, 99])
    y_t, noise, gamma = q_sample(sched, y0, t, jax.random.key(0))
    # gamma in [gamma_prev, gamma_cur] per sample
    g = np.asarray(gamma)
    gp = np.asarray(sched.gammas_prev)[np.asarray(t)]
    gc = np.asarray(sched.gammas)[np.asarray(t)]
    assert np.all(g >= gc - 1e-7) or np.all(g >= gp * 0)  # ordering below
    assert np.all(g <= gp + 1e-7)
    assert np.all(g >= gc - 1e-7)
    # t=0: noise masked -> y_t = sqrt(gamma) * y_0 exactly (palette.py:222)
    np.testing.assert_allclose(np.asarray(y_t[0]),
                               np.sqrt(g[0]) * np.ones((8, 8, 1)), rtol=1e-5)
    assert float(jnp.abs(noise[0]).max()) == 0.0


def test_q_mean_variance_formula():
    sched = make_schedule("linear", 50, 1e-3, 0.05)
    rng = np.random.default_rng(0)
    y0 = rng.normal(size=(2, 4, 4, 1)).astype(np.float32)
    yt = rng.normal(size=(2, 4, 4, 1)).astype(np.float32)
    t = np.array([3, 40])
    mean, logvar = q_mean_variance(sched, jnp.asarray(y0), jnp.asarray(yt),
                                   jnp.asarray(t))
    alphas = np.asarray(sched.alphas)
    gammas = np.asarray(sched.gammas)
    gprev = np.asarray(sched.gammas_prev)
    for i, ti in enumerate(t):
        a, g, gp = alphas[ti], gammas[ti], gprev[ti]
        em = (np.sqrt(gp) * (1 - a) / (1 - g)) * y0[i] + \
             (np.sqrt(a) * (1 - gp) / (1 - g)) * yt[i]
        ev = np.log(max((1 - a) * (1 - gp) / (1 - g), 1e-20))
        np.testing.assert_allclose(np.asarray(mean[i]), em, rtol=1e-5)
        # log-variance is per-sample scalar, broadcastable [1,1,1]
        np.testing.assert_allclose(
            np.broadcast_to(np.asarray(logvar[i]), em.shape),
            np.full_like(em, ev), rtol=1e-5)


def test_p_mean_variance_x0_clamp_and_learned_var():
    sched = make_schedule("cosine", 20)
    rng = np.random.default_rng(1)
    yt = rng.normal(size=(2, 4, 4, 1)).astype(np.float32)
    t = np.array([5, 15])
    # huge noise prediction forces x0 outside [-1,1] -> must be clamped
    out = 100.0 * np.ones((2, 4, 4, 1), np.float32)
    mean, logvar = p_mean_variance(sched, jnp.asarray(out), jnp.asarray(yt),
                                   jnp.asarray(t), learn_var=False)
    assert np.isfinite(np.asarray(mean)).all()
    # learned variance: var channel +1 -> log upper bound log(1-alpha)
    out2 = np.concatenate([np.zeros((2, 4, 4, 1), np.float32),
                           np.ones((2, 4, 4, 1), np.float32)], axis=-1)
    _, logvar2 = p_mean_variance(sched, jnp.asarray(out2), jnp.asarray(yt),
                                 jnp.asarray(t), learn_var=True)
    alphas = np.asarray(sched.alphas)
    for i, ti in enumerate(t):
        np.testing.assert_allclose(np.asarray(logvar2[i]),
                                   np.full((4, 4, 1), np.log(1 - alphas[ti])),
                                   rtol=1e-5)


def test_normal_kl_zero_for_identical():
    m = jnp.asarray(np.random.default_rng(2).normal(size=(3, 2)))
    lv = jnp.zeros((3, 2))
    np.testing.assert_allclose(np.asarray(normal_kl(m, lv, m, lv)), 0.0,
                               atol=1e-7)


def test_discretized_gaussian_nll_matches_formula():
    rng = np.random.default_rng(3)
    x = np.clip(rng.normal(size=(2, 4, 4, 1)), -1, 1).astype(np.float32)
    means = rng.normal(size=x.shape).astype(np.float32) * 0.1
    log_scales = np.full(x.shape, -1.0, np.float32)
    got = np.asarray(discretized_gaussian_log_likelihood(
        jnp.asarray(x), means=jnp.asarray(means),
        log_scales=jnp.asarray(log_scales)))

    def cdf(v):
        return (0.5 * (1 + np.tanh(np.float32(math.sqrt(2 / math.pi)) *
                                   (v + np.float32(0.044715) * v**3)))
                ).astype(np.float32)

    inv = np.exp(-log_scales).astype(np.float32)
    cp = cdf(inv * (x - means + np.float32(1 / 255)))
    cm = cdf(inv * (x - means - np.float32(1 / 255)))
    expected = np.where(
        x < -0.999, np.log(np.maximum(cp, 1e-12)),
        np.where(x > 0.999, np.log(np.maximum(1 - cm, 1e-12)),
                 np.log(np.maximum(cp - cm, 1e-12))))
    # Mask the ill-conditioned deep tail where cdf_delta underflows in f32
    # (1-ulp tanh differences explode through the log; torch is equally
    # unstable there). The well-conditioned region must match tightly.
    ok = (cp - cm) > 1e-6
    assert ok.mean() > 0.8
    np.testing.assert_allclose(got[ok], expected[ok], rtol=1e-3, atol=1e-5)


def test_vlb_t0_uses_nll():
    sched = make_schedule("linear", 10, 1e-3, 0.05)
    rng = np.random.default_rng(4)
    y0 = np.clip(rng.normal(size=(2, 4, 4, 1)), -1, 1).astype(np.float32)
    yt = rng.normal(size=(2, 4, 4, 1)).astype(np.float32)
    out = rng.normal(size=(2, 4, 4, 1)).astype(np.float32)
    v_t0 = vlb_term(sched, jnp.asarray(out), jnp.asarray(y0),
                    jnp.asarray(yt), jnp.array([0, 5]), learn_var=False)
    v = np.asarray(v_t0)
    assert v.shape == (2,)
    assert np.isfinite(v).all()


def test_sampler_process_capture():
    """output_process capture (palette.py:79-100): y_T plus every
    (T // 7)-th step's frame."""
    sched = make_schedule("cosine", 14)

    def denoise(x, y_t, gamma):
        return 0.05 * y_t

    x = jnp.zeros((1, 8, 8, 1))
    y0, process = ddpm_sample(sched, denoise, x, jax.random.key(3),
                              capture_every=sched.timesteps // 7)
    # frames at t % 2 == 0: t = 12,10,8,6,4,2,0 -> 7 frames + initial y_T
    assert process.shape == (1, 8, 8, 8, 1)
    np.testing.assert_array_equal(np.asarray(process[:, -1]), np.asarray(y0))


def test_sampler_shapes_and_determinism():
    sched = make_schedule("cosine", 8)

    def denoise(x, y_t, gamma):
        return 0.1 * y_t  # fake noise predictor

    x = jnp.zeros((2, 8, 8, 1))
    a = ddpm_sample(sched, denoise, x, jax.random.key(7))
    b = ddpm_sample(sched, denoise, x, jax.random.key(7))
    c = ddpm_sample(sched, denoise, x, jax.random.key(8))
    assert a.shape == (2, 8, 8, 1)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert not np.array_equal(np.asarray(a), np.asarray(c))
