"""Full-model forward parity with the PyTorch reference.

The fixture (tests/fixtures/pix2pix_tiny.npz, built by
tools/make_parity_fixture.py against /root/reference) holds inputs and the
reference outputs of the torch Pix2Pix UNet + PatchGAN discriminator in eval
mode with weights drawn from a deterministic numpy stream; this test
regenerates the identical weights, loads them into the pai_tpu flax models
through the documented layout mappings (torch conv OIHW -> HWIO, convT
(in,out,kh,kw) -> HWIO), and pins the outputs. This is end-to-end numerical
parity of the whole operator chain (convs, transposed convs, norms,
activations, skip concatenations), not just per-op parity.
"""

import json
import os
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from flax.traverse_util import flatten_dict, unflatten_dict

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures",
                       "pix2pix_tiny.npz")


@pytest.fixture(scope="module")
def fixture():
    if not os.path.exists(FIXTURE):
        pytest.skip("parity fixture missing (tools/make_parity_fixture.py)")
    z = np.load(FIXTURE)
    manifest = json.loads(str(z["manifest"]))
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir,
                                    "tools"))
    from make_parity_fixture import deterministic_weights

    return z, deterministic_weights(manifest)


def _conv(w):   # torch OIHW -> HWIO
    return jnp.asarray(np.transpose(w, (2, 3, 1, 0)))


def _convt(w):  # torch (in,out,kh,kw) -> HWIO (op flips spatially at apply)
    return jnp.asarray(np.transpose(w, (2, 3, 0, 1)))


def test_pix2pix_unet_forward_matches_reference(fixture):
    z, w = fixture
    from pai_tpu.models import build_generator

    gen = build_generator("pix2pix", channel_mults=(1, 2))
    params = unflatten_dict({
        ("stem", "kernel"): _conv(w["unet.encoders.0.weight"]),
        ("stem", "bias"): jnp.asarray(w["unet.encoders.0.bias"]),
        ("enc_1", "Conv_0", "kernel"): _conv(
            w["unet.encoders.1.encode.1.weight"]),
        ("enc_1", "Conv_0", "bias"): jnp.asarray(
            w["unet.encoders.1.encode.1.bias"]),
        ("dec_0", "ConvTranspose_0", "kernel"): _convt(
            w["unet.decoders.0.decode.1.weight"]),
        ("dec_0", "ConvTranspose_0", "bias"): jnp.asarray(
            w["unet.decoders.0.decode.1.bias"]),
        ("dec_0", "BatchNorm_0", "BatchNorm_0", "scale"): jnp.asarray(
            w["unet.decoders.0.decode.2.weight"]),
        ("dec_0", "BatchNorm_0", "BatchNorm_0", "bias"): jnp.asarray(
            w["unet.decoders.0.decode.2.bias"]),
        ("head", "kernel"): _convt(w["unet.decoders.1.weight"]),
        ("head", "bias"): jnp.asarray(w["unet.decoders.1.bias"]),
    })
    batch_stats = unflatten_dict({
        ("dec_0", "BatchNorm_0", "BatchNorm_0", "mean"): jnp.asarray(
            w["unet.decoders.0.decode.2.running_mean"]),
        ("dec_0", "BatchNorm_0", "BatchNorm_0", "var"): jnp.asarray(
            w["unet.decoders.0.decode.2.running_var"]),
    })
    x = jnp.asarray(np.transpose(z["x"], (0, 2, 3, 1)))
    out = gen.apply({"params": params, "batch_stats": batch_stats}, x,
                    train=False)
    expected = np.transpose(z["gen_out"], (0, 2, 3, 1))
    np.testing.assert_allclose(np.asarray(out), expected,
                               rtol=1e-4, atol=1e-5)


def test_discriminator_forward_matches_reference(fixture):
    z, w = fixture
    from pai_tpu.models import Discriminator

    disc = Discriminator()
    flat = {}
    for i in range(4):
        flat[(f"DiscriminatorBlock_{i}", "Conv_0", "kernel")] = _conv(
            w[f"disc.discriminator.{i}.block.0.weight"])
        flat[(f"DiscriminatorBlock_{i}", "Conv_0", "bias")] = jnp.asarray(
            w[f"disc.discriminator.{i}.block.0.bias"])
    flat[("Conv_0", "kernel")] = _conv(w["disc.discriminator.4.weight"])
    params = unflatten_dict(flat)

    x = jnp.asarray(np.transpose(z["x"], (0, 2, 3, 1)))
    y = jnp.asarray(np.transpose(z["y"], (0, 2, 3, 1)))
    out = disc.apply({"params": params}, x, y)
    expected = np.transpose(z["disc_out"], (0, 2, 3, 1))
    np.testing.assert_allclose(np.asarray(out), expected,
                               rtol=1e-4, atol=1e-5)
