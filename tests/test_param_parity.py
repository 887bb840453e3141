"""Parameter-count parity with the PyTorch reference.

Golden values extracted once by instantiating the reference's plain
nn.Modules (models/pix2pix.py Unet, models/wrapper.py Discriminator,
models/attention_unet.py AttentionUnet, models/res_unet.py ResUnet,
models/trans_unet.py TransUnet, models/guided_diffusion/unet.py UNet) with
in_channels=out_channels=1 and the CLI-default channel mults, and summing
p.numel(). Architectural parity at the parameter level is a strong
structural invariant: it pins layer counts, widths, bias presence and norm
parameterisation all at once.
"""

import jax
import jax.numpy as jnp
import pytest

from pai_tpu.models import build_generator, Discriminator
from pai_tpu.utils.flops import parameter_count

MULTS = (1, 2, 4, 8, 8, 8, 8, 8)

GOLDEN = {
    "pix2pix": 54_413_313,
    "attention_unet": 55_556_662,
    "res18_unet": 55_667_137,
    "res50_unet": 7_814_593,
    "resv2_unet": 55_677_121,
    "resnext_unet": 3_954_817,
}
GOLDEN_DISCRIMINATOR = 2_763_712      # Discriminator(in_channels=1)
GOLDEN_TRANS_UNET = 1_026_822_465    # mults (1,2,2,4,4), patch 4, heads 8
GOLDEN_PALETTE_SMALL = 18_308_225    # inner 128, mults (1,2), attn (2,)


def _count(model, *args):
    variables = jax.eval_shape(
        lambda: model.init(jax.random.key(0), *args, train=False))
    return parameter_count(variables["params"])


@pytest.mark.parametrize("name,golden", sorted(GOLDEN.items()))
def test_generator_param_counts(name, golden):
    model = build_generator(name, channel_mults=MULTS)
    x = jnp.zeros((1, 256, 256, 1))
    assert _count(model, x) == golden


def test_discriminator_param_count():
    d = Discriminator()
    x = jnp.zeros((1, 256, 256, 1))
    variables = jax.eval_shape(lambda: d.init(jax.random.key(0), x, x))
    assert parameter_count(variables["params"]) == GOLDEN_DISCRIMINATOR


@pytest.mark.slow
def test_trans_unet_param_count():
    model = build_generator("trans_unet", channel_mults=(1, 2, 2, 4, 4))
    x = jnp.zeros((1, 256, 256, 1))
    assert _count(model, x) == GOLDEN_TRANS_UNET


def test_palette_small_param_count():
    model = build_generator("palette", channel_mults=(1, 2),
                            attention_res=(2,))
    x = jnp.zeros((1, 32, 32, 1))
    g = jnp.ones((1,), jnp.float32)
    variables = jax.eval_shape(
        lambda: model.init(jax.random.key(0), x, x, g, train=False))
    assert parameter_count(variables["params"]) == GOLDEN_PALETTE_SMALL
