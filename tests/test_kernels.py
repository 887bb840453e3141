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


def test_flash_attention_backward_rule_parity():
    """The custom_vjp backward (recompute via the XLA reference) must equal
    the gradient of full attention."""
    from pai_tpu.kernels import flash_attention as fa
    from pai_tpu.ops.attention import _full_attention

    rng = jax.random.key(1)
    kq, kk, kv, kg = jax.random.split(rng, 4)
    b, h, t, d = 1, 1, 512, 32
    q = jax.random.normal(kq, (b, h, t, d), jnp.float32)
    k = jax.random.normal(kk, (b, h, t, d), jnp.float32)
    v = jax.random.normal(kv, (b, h, t, d), jnp.float32)
    g = jax.random.normal(kg, (b, h, t, d), jnp.float32)

    _, vjp_ref = jax.vjp(_full_attention, q, k, v)
    expected = vjp_ref(g)
    got = fa._flash_bwd_rule((q, k, v), g)
    for a, e in zip(got, expected):
        np.testing.assert_allclose(np.asarray(a), np.asarray(e),
                                   rtol=5e-5, atol=5e-5)
