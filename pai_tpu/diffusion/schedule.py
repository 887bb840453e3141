"""Noise schedules as precomputed arrays (reference
``models/palette.py:177-212, 348-365``).

The training schedule is a 2000-step linear(1e-6, 0.01) beta ramp and the
sampling schedule an independent 100-step cosine — an SR3-style schedule
transfer enabled by conditioning the model on the *continuous* noise level
gamma rather than the integer step (``palette.py:64-77``).

Note the reference cosine schedule uses cos(...) **without** squaring
(``palette.py:353``), deviating from Nichol & Dhariwal's cos^2 — replicated
exactly.
"""

from __future__ import annotations

import dataclasses
import math

import numpy as np
import jax.numpy as jnp


def linear_beta_schedule(timesteps: int, start: float = 1e-6,
                         end: float = 0.01) -> np.ndarray:
    return np.linspace(start, end, timesteps, dtype=np.float64)


def cosine_beta_schedule(timesteps: int, s: float = 0.008) -> np.ndarray:
    steps = timesteps + 1
    x = np.linspace(0, timesteps, steps, dtype=np.float64)
    gammas = np.cos((math.pi / 2) * ((x / timesteps) + s) / (1 + s))
    gammas = gammas / gammas[0]
    betas = 1 - (gammas[1:] / gammas[:-1])
    return np.clip(betas, 0.0001, 0.9999)


@dataclasses.dataclass(frozen=True)
class DiffusionSchedule:
    """Precomputed schedule buffers (palette.py:202-212), device arrays."""

    timesteps: int
    alphas: jnp.ndarray       # 1 - betas
    gammas: jnp.ndarray       # cumprod(alphas)
    gammas_prev: jnp.ndarray  # [1, gammas[:-1]]


def make_schedule(schedule_type: str, timesteps: int, start: float = 1e-6,
                  end: float = 0.01) -> DiffusionSchedule:
    if schedule_type == "linear":
        betas = linear_beta_schedule(timesteps, start, end)
    elif schedule_type == "cosine":
        betas = cosine_beta_schedule(timesteps)
    else:
        raise ValueError(f"{schedule_type} is not supported.")
    alphas = 1.0 - betas
    gammas = np.cumprod(alphas)
    gammas_prev = np.concatenate([[1.0], gammas[:-1]])
    return DiffusionSchedule(
        timesteps=timesteps,
        alphas=jnp.asarray(alphas, jnp.float32),
        gammas=jnp.asarray(gammas, jnp.float32),
        gammas_prev=jnp.asarray(gammas_prev, jnp.float32),
    )
