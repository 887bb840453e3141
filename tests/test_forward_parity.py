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
from flax.traverse_util import unflatten_dict

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


from parity_port import (  # noqa: E402  (tests dir on sys.path via conftest)
    conv_w as _conv,
    convt_w as _convt,
    port_attention,
    port_diffusion_unet,
    port_discriminator,
    port_pix2pix,
    port_res18,
)


def test_pix2pix_unet_forward_matches_reference(fixture):
    z, w = fixture
    from pai_tpu.models import build_generator

    gen = build_generator("pix2pix", channel_mults=(1, 2))
    params, batch_stats = port_pix2pix(w)
    x = jnp.asarray(np.transpose(z["x"], (0, 2, 3, 1)))
    out = gen.apply({"params": params, "batch_stats": batch_stats}, x,
                    train=False)
    expected = np.transpose(z["gen_out"], (0, 2, 3, 1))
    np.testing.assert_allclose(np.asarray(out), expected,
                               rtol=1e-4, atol=1e-5)


DIFFUSION_FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures",
                                 "diffusion_tiny.npz")


def test_diffusion_unet_forward_matches_reference(fixture_gd):
    """Full guided_diffusion UNet chain parity: gamma embedding, FiLM
    ResBlocks, BatchNorm attention, resblock down/up sampling, skip cats,
    zero-init head — weights ported from the torch reference layout."""
    z, w = fixture_gd
    from pai_tpu.models.diffusion_unet import DiffusionUNet

    model = DiffusionUNet(in_channels=2, out_channels=1, inner_channel=32,
                          res_blocks=2, channel_mults=(1, 2), attn_res=(2,),
                          num_heads=4)
    shapes = ((1, 16, 16, 1), (1, 16, 16, 1), (1,))
    params, stats = port_diffusion_unet(model, w, shapes)
    variables = {"params": params, "batch_stats": stats}
    x = jnp.asarray(np.transpose(z["x"], (0, 2, 3, 1)))
    y = jnp.asarray(np.transpose(z["y"], (0, 2, 3, 1)))
    gammas = jnp.asarray(z["gammas"])
    out = model.apply(variables, x, y, gammas, train=False)
    expected = np.transpose(z["out"], (0, 2, 3, 1))
    np.testing.assert_allclose(np.asarray(out), expected,
                               rtol=1e-4, atol=1e-5)


@pytest.fixture(scope="module")
def fixture_gd():
    if not os.path.exists(DIFFUSION_FIXTURE):
        pytest.skip("diffusion parity fixture missing")
    z = np.load(DIFFUSION_FIXTURE)
    manifest = json.loads(str(z["manifest"]))
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir,
                                    "tools"))
    from make_parity_fixture import deterministic_weights

    return z, deterministic_weights(manifest)


def _load_fixture(fname):
    path = os.path.join(os.path.dirname(__file__), "fixtures", fname)
    if not os.path.exists(path):
        pytest.skip(f"{fname} missing (tools/make_parity_fixture.py)")
    z = np.load(path)
    manifest = json.loads(str(z["manifest"]))
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir,
                                    "tools"))
    from make_parity_fixture import deterministic_weights

    return z, deterministic_weights(manifest)


def _bn(flat, w, my_prefix, torch_mod, params, stats):
    params[my_prefix + ("scale",)] = jnp.asarray(w[f"{torch_mod}.weight"])
    params[my_prefix + ("bias",)] = jnp.asarray(w[f"{torch_mod}.bias"])
    stats[my_prefix + ("mean",)] = jnp.asarray(w[f"{torch_mod}.running_mean"])
    stats[my_prefix + ("var",)] = jnp.asarray(w[f"{torch_mod}.running_var"])


def _cv(flat, w, my_prefix, torch_mod):
    flat[my_prefix + ("kernel",)] = _conv(w[f"{torch_mod}.weight"])
    flat[my_prefix + ("bias",)] = jnp.asarray(w[f"{torch_mod}.bias"])


def test_res18_unet_forward_matches_reference():
    """ResUNet-18 full chain: stem, residual enc (maxpool), residual dec
    (nearest up), skip cats, tanh head (res_unet.py:52-74, 182-335)."""
    z, w = _load_fixture("res18_tiny.npz")
    from pai_tpu.models.res_unet import ResUnet

    model = ResUnet(out_channels=1, res_type="18", channel_mults=(1, 2),
                    dropout=0.0)
    params, stats = port_res18(w)
    x = jnp.asarray(np.transpose(z["in0"], (0, 2, 3, 1)))
    out = model.apply({"params": params, "batch_stats": stats}, x,
                      train=False)
    np.testing.assert_allclose(np.asarray(out),
                               np.transpose(z["out"], (0, 2, 3, 1)),
                               rtol=1e-4, atol=1e-5)


def test_attention_unet_forward_matches_reference():
    """Attention U-Net full chain incl. the additive attention gate
    (attention_unet.py:48-96, 99-208)."""
    z, w = _load_fixture("attention_tiny.npz")
    from pai_tpu.models.attention_unet import AttentionUnet

    model = AttentionUnet(out_channels=1, channel_mults=(1, 2), dropout=0.0)
    params, stats = port_attention(w)
    x = jnp.asarray(np.transpose(z["in0"], (0, 2, 3, 1)))
    out = model.apply({"params": params, "batch_stats": stats}, x,
                      train=False)
    np.testing.assert_allclose(np.asarray(out),
                               np.transpose(z["out"], (0, 2, 3, 1)),
                               rtol=1e-4, atol=1e-5)


def test_trans_unet_forward_matches_reference():
    """TransUNet full chain: stem, stride-2 bottleneck encoders, patchify +
    12-layer post-LN ViT, conv decoders, tanh head (trans_unet.py). Fixture
    built from the reference with its silent batch-axis attention corrected
    to the intended per-sample patch attention (see
    tools/make_parity_fixture.make_trans_unet_fixture)."""
    z, w = _load_fixture("trans_tiny.npz")
    from pai_tpu.models.trans_unet import TransUnet

    model = TransUnet(out_channels=1, image_size=32, channel_mults=(1, 1),
                      patch_size=4, num_heads=8, dropout=0.0)
    params, stats = {}, {}
    _cv(params, w, ("stem",), "tr.in_conv")
    for e in range(2):
        tm = f"tr.encoders.{e}"
        my = (f"enc_{e}",)
        for conv_i, bn_i, tsub in ((0, 0, "decode.0"), (1, 1, "decode.3"),
                                   (2, 2, "decode.6"), (3, 3, "skip.0")):
            tmod = f"{tm}.{tsub}"
            # bias-free convs (trans_unet.py:196-222)
            params[my + (f"Conv_{conv_i}", "kernel")] = _conv(
                w[f"{tmod}.weight"])
        for bn_i, tsub in ((0, "decode.1"), (1, "decode.4"), (2, "decode.7"),
                           (3, "skip.1")):
            _bn(params, w, my + (f"BatchNorm_{bn_i}", "BatchNorm_0"),
                f"{tm}.{tsub}", params, stats)

    vb = "tr.vit_bottleneck"
    for ln_i, tsub in ((0, "to_patch_embedding.1"),
                       (1, "to_patch_embedding.3")):
        params[("vit", f"LayerNorm_{ln_i}", "LayerNorm_0", "scale")] = \
            jnp.asarray(w[f"{vb}.{tsub}.weight"])
        params[("vit", f"LayerNorm_{ln_i}", "LayerNorm_0", "bias")] = \
            jnp.asarray(w[f"{vb}.{tsub}.bias"])
    params[("vit", "Dense_0", "Dense_0", "kernel")] = jnp.asarray(
        w[f"{vb}.to_patch_embedding.2.weight"].T)
    params[("vit", "Dense_0", "Dense_0", "bias")] = jnp.asarray(
        w[f"{vb}.to_patch_embedding.2.bias"])
    params[("vit", "pos_embedding")] = jnp.asarray(w[f"{vb}.pos_embedding"])
    for i in range(12):
        tl = f"{vb}.transformer.layers.{i}"
        my = ("vit", f"layer_{i}")
        params[my + ("in_proj", "Dense_0", "kernel")] = jnp.asarray(
            w[f"{tl}.self_attn.in_proj_weight"].T)
        params[my + ("in_proj", "Dense_0", "bias")] = jnp.asarray(
            w[f"{tl}.self_attn.in_proj_bias"])
        params[my + ("out_proj", "Dense_0", "kernel")] = jnp.asarray(
            w[f"{tl}.self_attn.out_proj.weight"].T)
        params[my + ("out_proj", "Dense_0", "bias")] = jnp.asarray(
            w[f"{tl}.self_attn.out_proj.bias"])
        params[my + ("ffn1", "Dense_0", "kernel")] = jnp.asarray(
            w[f"{tl}.linear1.weight"].T)
        params[my + ("ffn1", "Dense_0", "bias")] = jnp.asarray(
            w[f"{tl}.linear1.bias"])
        params[my + ("ffn2", "Dense_0", "kernel")] = jnp.asarray(
            w[f"{tl}.linear2.weight"].T)
        params[my + ("ffn2", "Dense_0", "bias")] = jnp.asarray(
            w[f"{tl}.linear2.bias"])
        for ln_i, tn in ((0, "norm1"), (1, "norm2")):
            params[my + (f"LayerNorm_{ln_i}", "LayerNorm_0", "scale")] = \
                jnp.asarray(w[f"{tl}.{tn}.weight"])
            params[my + (f"LayerNorm_{ln_i}", "LayerNorm_0", "bias")] = \
                jnp.asarray(w[f"{tl}.{tn}.bias"])

    for d, tm in (("dec_0", "tr.decoders.0.decode"),
                  ("dec_final", "tr.decoders.1.decode")):
        _cv(params, w, (d, "Conv_0"), f"{tm}.0")
        _bn(params, w, (d, "BatchNorm_0", "BatchNorm_0"), f"{tm}.1",
            params, stats)
        _cv(params, w, (d, "Conv_1"), f"{tm}.3")
        _bn(params, w, (d, "BatchNorm_1", "BatchNorm_0"), f"{tm}.4",
            params, stats)
    _cv(params, w, ("head",), "tr.out.0")

    x = jnp.asarray(np.transpose(z["in0"], (0, 2, 3, 1)))
    out = model.apply({"params": unflatten_dict(params),
                       "batch_stats": unflatten_dict(stats)}, x, train=False)
    np.testing.assert_allclose(np.asarray(out),
                               np.transpose(z["out"], (0, 2, 3, 1)),
                               rtol=1e-4, atol=2e-5)


def test_discriminator_forward_matches_reference(fixture):
    z, w = fixture
    from pai_tpu.models import Discriminator

    disc = Discriminator()
    params = port_discriminator(w)
    x = jnp.asarray(np.transpose(z["x"], (0, 2, 3, 1)))
    y = jnp.asarray(np.transpose(z["y"], (0, 2, 3, 1)))
    out = disc.apply({"params": params}, x, y)
    expected = np.transpose(z["disc_out"], (0, 2, 3, 1))
    np.testing.assert_allclose(np.asarray(out), expected,
                               rtol=1e-4, atol=1e-5)
