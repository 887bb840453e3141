"""On-device DDPM reverse sampler as a single ``lax.scan``.

The reference samples with a Python loop of 100 sequential UNet forwards
(``models/palette.py:79-100``, ``palette.py:233-252``) — the most expensive
inner loop in the codebase. Here the whole reverse chain is one compiled
``lax.scan`` whose carry is (y_t, PRNG key): inference never leaves HBM
(SURVEY §3.2 north star). Noise is zeroed for t <= 1, matching
``palette.py:250``.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp

from pai_tpu.diffusion.schedule import DiffusionSchedule
from pai_tpu.diffusion.gaussian import p_mean_variance


def ddpm_sample(
    sched: DiffusionSchedule,
    denoise_fn: Callable,
    x,
    rng,
    learn_var: bool = False,
    capture_every: Optional[int] = None,
    y_T=None,
    step_noise=None,
):
    """Run the full reverse chain conditioned on ``x`` [N,H,W,C].

    ``denoise_fn(x, y_t, gamma[N]) -> model_output`` is the (already
    parameter-bound, eval-mode) UNet. Returns ``y_0`` — and, if
    ``capture_every`` is set, the stacked intermediate frames
    (palette.py:83-95's 8-frame process capture: y_T plus every
    ``timesteps // 7``-th step).

    ``y_T`` and ``step_noise`` ([T, N, H, W, C], raw pre-mask, ordered
    t = T-1 .. 0) may be supplied for deterministic replay — the
    cross-framework parity harness feeds both sides the same stream.
    """
    n = x.shape[0]
    if y_T is None:
        rng, rng_init = jax.random.split(rng)
        y_T = jax.random.normal(rng_init, x.shape, jnp.float32)

    ts_py = list(range(sched.timesteps - 1, -1, -1))
    xs = {"i": jnp.asarray(ts_py)}
    if step_noise is not None:
        xs["noise"] = step_noise
    if capture_every:
        # Reference captures y_T first, then y_t whenever t % (T//7) == 0
        # (palette.py:88-95). Kept frames go into a fixed O(n_keep) carry
        # buffer via dynamic_update_slice — scanning them out as per-step
        # outputs would stack all T frames in HBM (T=100 x batch 128 x
        # 256² f32 ~= 3.4 GB) just to gather ~8 afterwards.
        keep_py = [int(t % capture_every == 0) for t in ts_py]
        slot_py = []
        s = 1  # slot 0 = y_T
        for k in keep_py:
            slot_py.append(s if k else 0)
            s += k
        n_frames = 1 + sum(keep_py)
        xs["keep"] = jnp.asarray(keep_py, bool)
        xs["slot"] = jnp.asarray(slot_py, jnp.int32)
        buf0 = jnp.zeros((n_frames,) + y_T.shape, jnp.float32).at[0].set(y_T)

    def step(carry, scanned):
        if capture_every:
            y_t, key, buf = carry
        else:
            y_t, key = carry
        key, knoise = jax.random.split(key)
        t = jnp.full((n,), scanned["i"], jnp.int32)
        gamma = sched.gammas[t]
        model_output = denoise_fn(x, y_t, gamma)
        mean, log_variance = p_mean_variance(
            sched, model_output, y_t, t, learn_var)
        noise = scanned["noise"] if step_noise is not None else \
            jax.random.normal(knoise, y_t.shape, jnp.float32)
        noise = noise * (t > 1).reshape(-1, 1, 1, 1)
        y_prev = mean + jnp.exp(0.5 * log_variance) * noise
        if capture_every:
            updated = jax.lax.dynamic_update_slice(
                buf, y_prev[None], (scanned["slot"],) + (0,) * y_prev.ndim)
            buf = jnp.where(scanned["keep"], updated, buf)
            return (y_prev, key, buf), None
        return (y_prev, key), None

    if capture_every:
        (y_0, _, buf), _ = jax.lax.scan(step, (y_T, rng, buf0), xs)
        return y_0, buf.swapaxes(0, 1)  # (N, F, H, W, C)
    (y_0, _), _ = jax.lax.scan(step, (y_T, rng), xs)
    return y_0
