"""DDPM diffusion math: schedules, q/p distributions, VLB, scan sampler."""

from pai_tpu.diffusion.schedule import (
    linear_beta_schedule,
    cosine_beta_schedule,
    DiffusionSchedule,
    make_schedule,
)
from pai_tpu.diffusion.gaussian import (
    q_sample,
    p_mean_variance,
    q_mean_variance,
    vlb_term,
    normal_kl,
    discretized_gaussian_log_likelihood,
)
from pai_tpu.diffusion.sampler import ddpm_sample
