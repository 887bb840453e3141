"""Forward-shape tests for all 8 CLI model names (SURVEY §4: shape-cheap unit
tests per model, main.py:218-230 name list), at reduced spatial size / depth
for CPU test speed, plus a 256x256 default-config check for pix2pix."""

import jax
import jax.numpy as jnp
import pytest

from pai_tpu.models import build_generator, Discriminator

SMALL_MULTS = (1, 2, 4)  # 3 levels, images 32x32 -> fast on CPU


@pytest.mark.parametrize("name", [
    "pix2pix", "attention_unet", "res18_unet", "res50_unet",
    "resv2_unet", "resnext_unet",
])
def test_gan_generator_shapes(name):
    model = build_generator(name, channel_mults=SMALL_MULTS)
    x = jnp.zeros((2, 32, 32, 1))
    variables = model.init(jax.random.key(0), x, train=False)
    y = model.apply(variables, x, train=False)
    assert y.shape == x.shape
    assert y.dtype == jnp.float32
    # tanh output range
    assert float(jnp.max(jnp.abs(y))) <= 1.0


def test_trans_unet_shapes():
    model = build_generator("trans_unet", channel_mults=(1, 2),
                            image_size=32)
    x = jnp.zeros((2, 32, 32, 1))
    variables = model.init(jax.random.key(0), x, train=False)
    y = model.apply(variables, x, train=False)
    assert y.shape == x.shape


def test_trans_unet_incompatible_mults_raises():
    # CLI-default 8-level mults collapse the ViT input to 1x1 (SURVEY quirk 5)
    with pytest.raises(ValueError):
        build_generator("trans_unet",
                        channel_mults=(1, 2, 4, 8, 8, 8, 8, 8))


def test_palette_unet_shapes():
    model = build_generator("palette", channel_mults=(1, 2),
                            attention_res=(2,))
    x = jnp.zeros((2, 32, 32, 1))
    y = jnp.zeros((2, 32, 32, 1))
    gammas = jnp.array([0.5, 0.9])
    variables = model.init(jax.random.key(0), x, y, gammas, train=False)
    out = model.apply(variables, x, y, gammas, train=False)
    assert out.shape == (2, 32, 32, 1)
    # zero-init output conv -> exactly zero output at init (unet.py:544-548)
    assert float(jnp.max(jnp.abs(out))) == 0.0


def test_palette_unet_learn_var_output_channels():
    model = build_generator("palette", channel_mults=(1, 2),
                            attention_res=(2,), learn_var=True)
    x = jnp.zeros((1, 32, 32, 1))
    variables = model.init(jax.random.key(0), x, x, jnp.array([0.5]),
                           train=False)
    out = model.apply(variables, x, x, jnp.array([0.5]), train=False)
    assert out.shape == (1, 32, 32, 2)


def test_discriminator_patch_logits():
    d = Discriminator()
    x = jnp.zeros((2, 64, 64, 1))
    variables = d.init(jax.random.key(0), x, x)
    logits = d.apply(variables, x, x)
    # 4 stride-2 blocks: 64 -> 4; final k4 s1 p1 conv: 4 -> 3
    assert logits.shape == (2, 3, 3, 1)


def test_train_mode_mutates_batch_stats():
    model = build_generator("pix2pix", channel_mults=SMALL_MULTS)
    x = jnp.ones((2, 32, 32, 1))
    variables = model.init(jax.random.key(0), x, train=False)
    y, mutated = model.apply(
        variables, x, train=True,
        rngs={"dropout": jax.random.key(1)},
        mutable=["batch_stats"],
    )
    assert y.shape == x.shape
    assert "batch_stats" in mutated


@pytest.mark.slow
def test_pix2pix_default_256():
    model = build_generator("pix2pix")
    x = jnp.zeros((1, 256, 256, 1))
    variables = model.init(jax.random.key(0), x, train=False)
    y = model.apply(variables, x, train=False)
    assert y.shape == (1, 256, 256, 1)


def test_attention_norm_composed_double_update():
    """The attention BatchNorm1d's running stats must compose TWO
    momentum-0.1 updates per train-mode application (r <- 0.81 r + 0.19 m):
    the reference wraps attention in always-on gradient checkpointing
    (guided_diffusion/unet.py:253-254) whose backward re-runs the forward
    in train mode, updating the stats a second time with the same batch
    statistics (PARITY.md quirk 11, discovered by the production-width
    pin). ResBlock norms update once (momentum 0.9)."""
    import numpy as np
    from pai_tpu.models.diffusion_unet import AttentionBlock

    block = AttentionBlock(num_heads=2)
    x = jax.random.normal(jax.random.key(1), (2, 4, 4, 8), jnp.float32)
    variables = block.init(jax.random.key(0), x, train=False)
    r_mean0 = np.asarray(variables["batch_stats"]["norm"]["BatchNorm_0"]["mean"])
    _, mut = block.apply(variables, x, train=True,
                         mutable=["batch_stats"])
    tokens = np.asarray(x).reshape(2, 16, 8)
    m = tokens.mean(axis=(0, 1))
    expected = 0.9 ** 2 * r_mean0 + (1 - 0.9 ** 2) * m
    got = np.asarray(mut["batch_stats"]["norm"]["BatchNorm_0"]["mean"])
    np.testing.assert_allclose(got, expected, rtol=1e-6, atol=1e-7)
