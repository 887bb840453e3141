"""Operator-level golden tests against torch CPU.

These pin the PyTorch-parity claims of pai_tpu.ops: identical weights are
loaded into both frameworks and outputs compared. This is the ground truth
the reference's numerics stand on (it delegates everything to torch kernels,
SURVEY §2.3).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")


def _np(x):
    return np.asarray(x)


def test_conv2d_parity():
    import torch.nn as tnn
    from pai_tpu.ops import Conv

    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 1, 16, 16)).astype(np.float32)  # NCHW for torch
    tconv = tnn.Conv2d(1, 8, kernel_size=4, stride=2, padding=1)
    w = rng.normal(size=(8, 1, 4, 4)).astype(np.float32) * 0.02
    b = rng.normal(size=(8,)).astype(np.float32)
    with torch.no_grad():
        tconv.weight.copy_(torch.from_numpy(w))
        tconv.bias.copy_(torch.from_numpy(b))
        ty = tconv(torch.from_numpy(x)).numpy()

    conv = Conv(8, kernel_size=4, stride=2, padding=1)
    x_nhwc = jnp.asarray(x.transpose(0, 2, 3, 1))
    variables = conv.init(jax.random.key(0), x_nhwc)
    # torch OIHW -> HWIO
    variables = {"params": {"kernel": jnp.asarray(w.transpose(2, 3, 1, 0)),
                            "bias": jnp.asarray(b)}}
    jy = conv.apply(variables, x_nhwc)
    np.testing.assert_allclose(
        _np(jy).transpose(0, 3, 1, 2), ty, rtol=1e-5, atol=1e-5)


def test_conv_transpose2d_parity():
    """ConvTranspose(k4,s2,p1) == torch nn.ConvTranspose2d — SURVEY §7 hard
    part 4 (PyTorch output-padding convention)."""
    import torch.nn as tnn
    from pai_tpu.ops import ConvTranspose

    rng = np.random.default_rng(1)
    x = rng.normal(size=(2, 3, 8, 8)).astype(np.float32)
    tconv = tnn.ConvTranspose2d(3, 5, kernel_size=4, stride=2, padding=1)
    w = rng.normal(size=(3, 5, 4, 4)).astype(np.float32) * 0.02  # (in,out,kh,kw)
    b = rng.normal(size=(5,)).astype(np.float32)
    with torch.no_grad():
        tconv.weight.copy_(torch.from_numpy(w))
        tconv.bias.copy_(torch.from_numpy(b))
        ty = tconv(torch.from_numpy(x)).numpy()
    assert ty.shape == (2, 5, 16, 16)

    conv = ConvTranspose(5, kernel_size=4, stride=2, padding=1)
    x_nhwc = jnp.asarray(x.transpose(0, 2, 3, 1))
    # Our op stores the kernel in transposed-conv orientation and flips it
    # spatially at apply time, so the torch (in,out,kh,kw) weight maps to
    # HWIO with no flip.
    kernel = jnp.asarray(w.transpose(2, 3, 0, 1))
    variables = {"params": {"kernel": kernel, "bias": jnp.asarray(b)}}
    jy = conv.apply(variables, x_nhwc)
    assert jy.shape == (2, 16, 16, 5)
    np.testing.assert_allclose(
        _np(jy).transpose(0, 3, 1, 2), ty, rtol=1e-4, atol=1e-5)


def test_instance_norm_parity():
    import torch.nn as tnn
    from pai_tpu.ops import InstanceNorm

    rng = np.random.default_rng(2)
    x = rng.normal(size=(2, 4, 8, 8)).astype(np.float32)
    ty = tnn.InstanceNorm2d(4)(torch.from_numpy(x)).numpy()
    jy = InstanceNorm().apply({}, jnp.asarray(x.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(
        _np(jy).transpose(0, 3, 1, 2), ty, rtol=1e-4, atol=1e-5)


def test_batchnorm_train_parity():
    import torch.nn as tnn
    from pai_tpu.ops import BatchNorm

    rng = np.random.default_rng(3)
    x = rng.normal(size=(4, 3, 8, 8)).astype(np.float32)
    tbn = tnn.BatchNorm2d(3)
    ty = tbn(torch.from_numpy(x)).detach().numpy()

    bn = BatchNorm(use_running_average=False)
    x_nhwc = jnp.asarray(x.transpose(0, 2, 3, 1))
    variables = bn.init(jax.random.key(0), x_nhwc)
    jy, _ = bn.apply(variables, x_nhwc, mutable=["batch_stats"])
    np.testing.assert_allclose(
        _np(jy).transpose(0, 3, 1, 2), ty, rtol=1e-4, atol=1e-4)


def test_maxpool_avgpool_upsample_parity():
    import torch.nn.functional as tF
    from pai_tpu.ops import max_pool_2x, avg_pool_2x, upsample_nearest_2x

    rng = np.random.default_rng(4)
    x = rng.normal(size=(2, 3, 8, 8)).astype(np.float32)
    tx = torch.from_numpy(x)
    x_nhwc = jnp.asarray(x.transpose(0, 2, 3, 1))

    np.testing.assert_allclose(
        _np(max_pool_2x(x_nhwc)).transpose(0, 3, 1, 2),
        tF.max_pool2d(tx, 2).numpy(), rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(
        _np(avg_pool_2x(x_nhwc)).transpose(0, 3, 1, 2),
        tF.avg_pool2d(tx, 2).numpy(), rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(
        _np(upsample_nearest_2x(x_nhwc)).transpose(0, 3, 1, 2),
        tF.interpolate(tx, scale_factor=2, mode="nearest").numpy(),
        rtol=1e-6, atol=1e-6)


def test_gamma_embedding_parity():
    """Sinusoidal embedding vs the published guided_diffusion formula
    (nn.py:140-157), evaluated independently in numpy."""
    from pai_tpu.ops import gamma_embedding

    gammas = np.array([0.0, 0.3, 0.777, 1.0], dtype=np.float32)
    dim = 128
    half = dim // 2
    freqs = np.exp(-np.log(10000.0) * np.arange(half, dtype=np.float32) / half)
    args = gammas[:, None] * freqs[None]
    expected = np.concatenate([np.cos(args), np.sin(args)], axis=-1)
    got = _np(gamma_embedding(jnp.asarray(gammas), dim))
    np.testing.assert_allclose(got, expected, rtol=1e-5, atol=1e-6)


def test_attention_blockwise_matches_full():
    """Online-softmax blockwise attention is exact (ops/attention.py)."""
    from pai_tpu.ops.attention import _full_attention, _blockwise_attention

    rng = jax.random.key(5)
    kq, kk, kv = jax.random.split(rng, 3)
    q = jax.random.normal(kq, (2, 2, 256, 16))
    k = jax.random.normal(kk, (2, 2, 256, 16))
    v = jax.random.normal(kv, (2, 2, 256, 16))
    full = _full_attention(q, k, v)
    blocked = _blockwise_attention(q, k, v, 64, 64)
    np.testing.assert_allclose(_np(full), _np(blocked), rtol=2e-5, atol=2e-5)


def test_transformer_layer_matches_torch():
    """TransUNet's post-LN transformer layer == torch
    nn.TransformerEncoderLayer(gelu, batch_first=True) with ported weights
    (trans_unet.py:151-161 semantics, minus the reference's batch_first bug)."""
    import torch.nn as tnn

    import jax
    from flax.traverse_util import unflatten_dict
    from pai_tpu.models.trans_unet import TransformerLayer

    d, heads, ffn, t, n = 32, 4, 64, 8, 2
    tlayer = tnn.TransformerEncoderLayer(
        d, heads, dim_feedforward=ffn, dropout=0.0, activation="gelu",
        batch_first=True)
    tlayer.eval()

    rng = np.random.default_rng(11)

    def W(*shape):
        return (rng.standard_normal(shape) * 0.05).astype(np.float32)

    sd = tlayer.state_dict()
    new = {
        "self_attn.in_proj_weight": W(3 * d, d),
        "self_attn.in_proj_bias": W(3 * d),
        "self_attn.out_proj.weight": W(d, d),
        "self_attn.out_proj.bias": W(d),
        "linear1.weight": W(ffn, d),
        "linear1.bias": W(ffn),
        "linear2.weight": W(d, ffn),
        "linear2.bias": W(d),
        "norm1.weight": W(d) + 1.0,
        "norm1.bias": W(d),
        "norm2.weight": W(d) + 1.0,
        "norm2.bias": W(d),
    }
    for k, v in new.items():
        sd[k] = torch.from_numpy(v)
    tlayer.load_state_dict(sd)

    x = rng.standard_normal((n, t, d)).astype(np.float32)
    with torch.no_grad():
        expected = tlayer(torch.from_numpy(x)).numpy()

    layer = TransformerLayer(num_heads=heads, ffn_dim=ffn, dropout=0.0)
    params = unflatten_dict({
        ("in_proj", "Dense_0", "kernel"): jnp.asarray(
            new["self_attn.in_proj_weight"].T),
        ("in_proj", "Dense_0", "bias"): jnp.asarray(
            new["self_attn.in_proj_bias"]),
        ("out_proj", "Dense_0", "kernel"): jnp.asarray(
            new["self_attn.out_proj.weight"].T),
        ("out_proj", "Dense_0", "bias"): jnp.asarray(
            new["self_attn.out_proj.bias"]),
        ("ffn1", "Dense_0", "kernel"): jnp.asarray(new["linear1.weight"].T),
        ("ffn1", "Dense_0", "bias"): jnp.asarray(new["linear1.bias"]),
        ("ffn2", "Dense_0", "kernel"): jnp.asarray(new["linear2.weight"].T),
        ("ffn2", "Dense_0", "bias"): jnp.asarray(new["linear2.bias"]),
        ("LayerNorm_0", "LayerNorm_0", "scale"): jnp.asarray(
            new["norm1.weight"]),
        ("LayerNorm_0", "LayerNorm_0", "bias"): jnp.asarray(
            new["norm1.bias"]),
        ("LayerNorm_1", "LayerNorm_0", "scale"): jnp.asarray(
            new["norm2.weight"]),
        ("LayerNorm_1", "LayerNorm_0", "bias"): jnp.asarray(
            new["norm2.bias"]),
    })
    got = layer.apply({"params": params}, jnp.asarray(x), False)
    np.testing.assert_allclose(np.asarray(got), expected,
                               rtol=1e-4, atol=1e-5)


def test_attention_matches_torch_sdpa():
    from pai_tpu.ops.attention import _full_attention

    rng = np.random.default_rng(6)
    q = rng.normal(size=(2, 2, 64, 16)).astype(np.float32)
    k = rng.normal(size=(2, 2, 64, 16)).astype(np.float32)
    v = rng.normal(size=(2, 2, 64, 16)).astype(np.float32)
    expected = torch.nn.functional.scaled_dot_product_attention(
        torch.from_numpy(q), torch.from_numpy(k), torch.from_numpy(v)
    ).numpy()
    got = _np(_full_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v)))
    np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-5)


def test_ssim_psnr_cross_framework_witness():
    """torchmetrics is not installable in this environment, so the
    torchmetrics-0.11 SSIM/PSNR algorithm is implemented twice from the
    published semantics — once in torch (tools/train_parity.py, used to run
    the reference) and once in jnp (pai_tpu/utils/metrics.py). A shared
    misreading would require the identical mistake in two independent
    codebases in different frameworks; this test pins them to each other."""
    import sys
    import os

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir,
                                    "tools"))
    from train_parity import _torchmetrics_real

    tm = _torchmetrics_real()
    from pai_tpu.utils import metrics as M

    rng = np.random.default_rng(11)
    p = rng.uniform(0, 1, (3, 64, 64, 1)).astype(np.float32)
    t = rng.uniform(0, 1, (3, 64, 64, 1)).astype(np.float32)
    pt = torch.from_numpy(np.transpose(p, (0, 3, 1, 2)))
    tt = torch.from_numpy(np.transpose(t, (0, 3, 1, 2)))

    ssim_torch = float(tm.structural_similarity_index_measure(pt, tt))
    psnr_torch = float(tm.peak_signal_noise_ratio(pt, tt))
    ssim_jax = float(M.ssim(jnp.asarray(p), jnp.asarray(t)))
    psnr_jax = float(M.psnr(jnp.asarray(p), jnp.asarray(t)))

    assert ssim_jax == pytest.approx(ssim_torch, abs=1e-6)
    assert psnr_jax == pytest.approx(psnr_torch, abs=1e-4)
