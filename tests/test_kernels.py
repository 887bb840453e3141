"""Pallas kernel parity tests (interpret mode on CPU; the same kernels
compile natively on TPU — each kernel's caller falls back to the XLA
reference elsewhere, so these pin kernel==reference)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def test_flash_attention_forward_parity():
    from pai_tpu.kernels.flash_attention import _flash_forward
    from pai_tpu.ops.attention import _full_attention

    rng = jax.random.key(0)
    kq, kk, kv = jax.random.split(rng, 3)
    b, h, t, d = 1, 2, 1024, 64
    q = jax.random.normal(kq, (b, h, t, d), jnp.float32)
    k = jax.random.normal(kk, (b, h, t, d), jnp.float32)
    v = jax.random.normal(kv, (b, h, t, d), jnp.float32)

    expected = _full_attention(q, k, v)
    got = _flash_forward(q, k, v, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected),
                               rtol=2e-5, atol=2e-5)


def test_fused_ssim_parity():
    """Fused Pallas SSIM (interpret mode) == torchmetrics-parity reference."""
    from pai_tpu.kernels.ssim_pallas import _fused_forward
    from pai_tpu.utils.metrics import ssim_parts

    kx, ky = jax.random.split(jax.random.key(3))
    p = jax.random.uniform(kx, (3, 64, 64, 1))
    t = jax.random.uniform(ky, (3, 64, 64, 1))
    m_ref, f_ref = ssim_parts(p, t)
    m_got, f_got = _fused_forward(p, t, interpret=True)
    np.testing.assert_allclose(np.asarray(m_got), np.asarray(m_ref),
                               rtol=1e-6, atol=1e-7)
    # border rows/cols fold the reflect taps into one dot product (different
    # summation order than pad-then-blur): pure f32 reordering noise
    np.testing.assert_allclose(np.asarray(f_got), np.asarray(f_ref),
                               rtol=1e-4, atol=1e-5)


def test_fused_ssim_gradient_matches_reference():
    """custom_vjp backward (recompute through the XLA reference) must match
    grad of the reference — SSIM is a training loss (wrapper.py:53-63)."""
    from pai_tpu.kernels import ssim_pallas
    from pai_tpu.utils.metrics import ssim_parts

    kx, ky = jax.random.split(jax.random.key(4))
    p = jax.random.uniform(kx, (2, 32, 32, 1))
    t = jax.random.uniform(ky, (2, 32, 32, 1))

    g_ref = jax.grad(lambda a: -jnp.mean(ssim_parts(a, t)[0]))(p)
    # exercise the vjp rule directly (forward would need a TPU)
    out, vjp = jax.vjp(lambda a: ssim_parts(a, t), p)
    cot = (jnp.full_like(out[0], -1.0 / out[0].shape[0]),
           jnp.zeros_like(out[1]))
    g_rule = ssim_pallas._bwd((p, t), cot)[0]
    np.testing.assert_allclose(np.asarray(g_rule), np.asarray(g_ref),
                               rtol=1e-5, atol=1e-7)


def test_flash_attention_multiblock_parity():
    """t=2048 forces 2x2 blocks (BLOCK=1024): the online-softmax rescale
    (alpha/m/l carry at kv_idx>0) and the cross-block dq/dkv accumulation —
    the exact paths production engages at t>=4096 — must stay exact. The
    single-block tests above cannot catch a regression here."""
    from pai_tpu.kernels import flash_attention as fa
    from pai_tpu.ops.attention import _full_attention

    rng = jax.random.key(7)
    kq, kk, kv, kg = jax.random.split(rng, 4)
    b, h, t, d = 1, 1, 2048, 32
    q = jax.random.normal(kq, (b, h, t, d), jnp.float32)
    k = jax.random.normal(kk, (b, h, t, d), jnp.float32)
    v = jax.random.normal(kv, (b, h, t, d), jnp.float32)
    g = jax.random.normal(kg, (b, h, t, d), jnp.float32)
    assert fa._block_sizes(t, d)[0] < t  # genuinely multi-block

    expected = _full_attention(q, k, v)
    got = fa._flash_forward(q, k, v, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected),
                               rtol=5e-5, atol=5e-5)

    _, vjp_ref = jax.vjp(_full_attention, q, k, v)
    grads_ref = vjp_ref(g)
    o, lse = fa._flash_forward_with_lse(q, k, v, interpret=True)
    grads = fa._flash_backward(q, k, v, o, lse, g, interpret=True)
    for name, a, e in zip(("dq", "dk", "dv"), grads, grads_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(e),
                                   rtol=5e-4, atol=5e-5, err_msg=name)


def test_flash_attention_backward_kernels_parity():
    """The Pallas backward kernels (dq + dk/dv with saved lse) must equal
    the gradient of full attention (interpret mode on CPU)."""
    from pai_tpu.kernels import flash_attention as fa
    from pai_tpu.ops.attention import _full_attention

    rng = jax.random.key(1)
    kq, kk, kv, kg = jax.random.split(rng, 4)
    b, h, t, d = 1, 2, 512, 32
    q = jax.random.normal(kq, (b, h, t, d), jnp.float32)
    k = jax.random.normal(kk, (b, h, t, d), jnp.float32)
    v = jax.random.normal(kv, (b, h, t, d), jnp.float32)
    g = jax.random.normal(kg, (b, h, t, d), jnp.float32)

    _, vjp_ref = jax.vjp(_full_attention, q, k, v)
    expected = vjp_ref(g)

    o, lse = fa._flash_forward_with_lse(q, k, v, interpret=True)
    got = fa._flash_backward(q, k, v, o, lse, g, interpret=True)
    for name, a, e in zip(("dq", "dk", "dv"), got, expected):
        np.testing.assert_allclose(np.asarray(a), np.asarray(e),
                                   rtol=5e-4, atol=5e-5, err_msg=name)


def test_flash_attention_lse_matches_softmax():
    from pai_tpu.kernels import flash_attention as fa

    rng = jax.random.key(2)
    kq, kk, kv = jax.random.split(rng, 3)
    b, h, t, d = 1, 1, 256, 16
    q = jax.random.normal(kq, (b, h, t, d), jnp.float32)
    k = jax.random.normal(kk, (b, h, t, d), jnp.float32)
    v = jax.random.normal(kv, (b, h, t, d), jnp.float32)
    _, lse = fa._flash_forward_with_lse(q, k, v, interpret=True)
    scale = d ** -0.25
    logits = jnp.einsum("bhqd,bhkd->bhqk", q * scale, k * scale)
    expected = jax.nn.logsumexp(logits, axis=-1).reshape(b * h, t, 1)
    np.testing.assert_allclose(np.asarray(lse), np.asarray(expected),
                               rtol=1e-5, atol=1e-5)


def test_fused_ssim_scalar_parity():
    """Scalar-path fused SSIM (valid-window formulation, interpret mode)
    == the torchmetrics-parity reference's interior-mean per-image SSIM."""
    from pai_tpu.kernels.ssim_pallas import _scalar_forward
    from pai_tpu.utils.metrics import ssim_parts

    kx, ky = jax.random.split(jax.random.key(9))
    p = jax.random.uniform(kx, (3, 64, 64, 1))
    t = jax.random.uniform(ky, (3, 64, 64, 1))
    ref, _ = ssim_parts(p, t)
    got = _scalar_forward(p, t, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-6, atol=1e-7)


def test_fused_ssim_scalar_gradient_matches_reference():
    """ssim_per_image_fused's custom_vjp recomputes through the XLA
    reference: grads must match exactly."""
    import jax.numpy as jnp
    from pai_tpu.kernels import ssim_pallas
    from pai_tpu.utils.metrics import ssim_parts

    kx, ky = jax.random.split(jax.random.key(10))
    p = jax.random.uniform(kx, (2, 32, 32, 1))
    t = jax.random.uniform(ky, (2, 32, 32, 1))

    g_ref = jax.grad(lambda a: -jnp.mean(ssim_parts(a, t)[0]))(p)
    _, vjp = jax.vjp(lambda a: ssim_parts(a, t)[0], p)
    cot = -jnp.ones((2,)) / 2
    g_rule = ssim_pallas._sbwd((p, t), cot)[0]
    np.testing.assert_allclose(np.asarray(g_rule), np.asarray(g_ref),
                               rtol=1e-6, atol=1e-7)
