"""Weight-level palette sampler pin at 256².

``tools/sampler_parity.py`` drove the REFERENCE's own reverse-diffusion
chain (models/palette.py:79-100, 233-306) from briefly-trained reference
weights with a numpy-seeded noise stream, and committed the weights (as a
reference-format Lightning checkpoint) plus the sampler output under
tests/fixtures/sampler_pin/. Here the same weights are imported through
the production interop name maps and ``ddpm_sample`` runs from the
IDENTICAL weights and IDENTICAL noise — so the comparison isolates
sampler *semantics* from training-trajectory chaos (the training
head-to-head's 5.4e-3 / 1e-2 budget). 100 steps of f32 conv
reduction-order drift is the only remaining difference source.
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

pytestmark = pytest.mark.parity  # ~14 min CPU: 100-step 256² reverse chain

FIXDIR = os.path.join(os.path.dirname(__file__), "fixtures", "sampler_pin")
IMG = 256
TIMESTEPS = 100


def _nhwc(a):
    return np.moveaxis(a, -3, -1)


def test_palette_sampler_weight_level_pin():
    ckpt_path = os.path.join(FIXDIR, "ckpt.pt")
    if not os.path.exists(ckpt_path):
        pytest.skip("sampler_pin fixture missing (tools/sampler_parity.py)")
    import torch

    ckpt = torch.load(ckpt_path, map_location="cpu", weights_only=True)
    sd = {k: v.numpy() for k, v in ckpt["state_dict"].items()}
    hp = ckpt["hyper_parameters"]
    z = np.load(os.path.join(FIXDIR, "io.npz"))

    from pai_tpu.diffusion import make_schedule
    from pai_tpu.diffusion.sampler import ddpm_sample
    from pai_tpu.interop.torch_import import (
        _gd_index_map,
        _materialize,
        _palette_key,
    )
    from pai_tpu.models.diffusion_unet import DiffusionUNet

    mults = tuple(hp["channel_mults"])
    attn = tuple(hp["attention_res"])
    inner = sd["unet.input_blocks.0.0.weight"].shape[0]
    gen = DiffusionUNet(in_channels=2, out_channels=1, inner_channel=inner,
                        res_blocks=2, channel_mults=mults, attn_res=attn,
                        num_heads=4, dropout=0.0)

    x = jnp.asarray(_nhwc(z["x"]))
    b = x.shape[0]
    abstract = jax.eval_shape(lambda: gen.init(
        jax.random.key(0), x, x, jnp.ones((b,)), train=False))
    index_map = _gd_index_map(mults, attn)
    key_fn = lambda p: _palette_key(p, index_map)  # noqa: E731
    params = _materialize(abstract["params"], sd, key_fn)
    stats = _materialize(abstract["batch_stats"], sd, key_fn)

    # the identical noise stream the reference consumed (same seed, same
    # draw order: y_T first, then one draw per step, t = T-1 .. 0)
    rng = np.random.default_rng(int(z["noise_seed"]))
    y_T = rng.standard_normal((b, 1, IMG, IMG)).astype(np.float32)
    step_noise = rng.standard_normal(
        (TIMESTEPS, b, 1, IMG, IMG)).astype(np.float32)

    sched = make_schedule("cosine", TIMESTEPS)
    variables = {"params": params, "batch_stats": stats}

    def denoise_fn(xc, y_t, gamma):
        return gen.apply(variables, xc, y_t, gamma, train=False)

    y0 = ddpm_sample(sched, denoise_fn, x, jax.random.key(0),
                     y_T=jnp.asarray(_nhwc(y_T)),
                     step_noise=jnp.asarray(_nhwc(step_noise)))
    got = np.moveaxis(np.asarray(y0), -1, 1)
    ref = np.asarray(z["ref_y0"])

    err = float(np.abs(got - ref).max())
    print(f"sampler pin max|delta| = {err:.3e}")  # recorded in docs/PARITY.md
    # float-level agreement: semantic identity, not a trained-quality
    # budget. Measured 100-step drift is recorded in docs/PARITY.md.
    assert err <= 5e-4, err
    # and the two outputs are statistically indistinguishable images
    assert float(np.abs(got.mean() - ref.mean())) <= 1e-5
