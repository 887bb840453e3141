"""Sharded Pallas-kernel dispatch on multi-device meshes.

A bare ``pallas_call`` carries no GSPMD partitioning spec, so on dp/tp
meshes the dispatchers wrap the fused kernels in ``shard_map`` (batch over
'dp', attention heads over 'tp') instead of falling back to the XLA
formulations. With interpret mode forced these tests drive the *same*
dispatch path a TPU pod takes, on the 8-virtual-device CPU mesh — values
and gradients must match the XLA references, and the jaxpr must prove the
kernel (not the fallback) was actually picked.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from pai_tpu import kernels
from pai_tpu.parallel.context import mesh_context
from pai_tpu.utils import metrics as M


@pytest.fixture(autouse=True)
def force_interpret():
    kernels.set_interpret(True)
    yield
    kernels.set_interpret(False)


def _mesh(devices, tp: int = 1) -> Mesh:
    dp = len(devices) // tp
    return Mesh(np.asarray(devices).reshape(dp, tp), ("dp", "tp"))


def _rand(shape, seed):
    return jnp.asarray(
        np.random.default_rng(seed).uniform(size=shape).astype(np.float32))


# ---------------------------------------------------------------------------
# fused SSIM
# ---------------------------------------------------------------------------
def test_ssim_per_image_sharded_dispatch_and_parity(eight_devices):
    mesh = _mesh(eight_devices)
    pred, targ = _rand((8, 32, 32, 1), 0), _rand((8, 32, 32, 1), 1)
    expect = np.asarray(M.ssim_parts_xla(pred, targ)[0])

    with mesh_context(mesh):
        jaxpr = str(jax.make_jaxpr(M.ssim_per_image)(pred, targ))
        assert "pallas_call" in jaxpr, "fused kernel not dispatched"
        assert "shard_map" in jaxpr, "kernel not wrapped for the mesh"
        sh = NamedSharding(mesh, P("dp"))
        got = jax.jit(M.ssim_per_image)(
            jax.device_put(pred, sh), jax.device_put(targ, sh))
    np.testing.assert_allclose(np.asarray(got), expect,
                               rtol=1e-6, atol=1e-6)


def test_ssim_parts_sharded_map_parity(eight_devices):
    mesh = _mesh(eight_devices, tp=2)  # dp=4 x tp=2: batch shards over dp
    pred, targ = _rand((8, 32, 32, 1), 2), _rand((8, 32, 32, 1), 3)
    e_scalar, e_map = M.ssim_parts_xla(pred, targ)

    with mesh_context(mesh):
        jaxpr = str(jax.make_jaxpr(M.ssim_parts)(pred, targ))
        assert "pallas_call" in jaxpr and "shard_map" in jaxpr
        got_scalar, got_map = jax.jit(M.ssim_parts)(pred, targ)
    np.testing.assert_allclose(np.asarray(got_scalar), np.asarray(e_scalar),
                               rtol=1e-6, atol=1e-6)
    # border taps fold into one dot (f32 reordering noise vs pad-then-blur)
    np.testing.assert_allclose(np.asarray(got_map), np.asarray(e_map),
                               rtol=1e-4, atol=1e-5)


def test_ssim_sharded_gradients_match_xla(eight_devices):
    """SSIM is a training loss (wrapper.py:53-63): the sharded-kernel path
    must produce the XLA gradients (custom_vjp recompute, per shard)."""
    mesh = _mesh(eight_devices)
    pred, targ = _rand((8, 32, 32, 1), 4), _rand((8, 32, 32, 1), 5)
    g_ref = jax.grad(
        lambda a: -jnp.mean(M.ssim_parts_xla(a, targ)[0]))(pred)

    with mesh_context(mesh):
        loss = lambda a: -jnp.mean(M.ssim_per_image(a, targ))  # noqa: E731
        assert "pallas_call" in str(jax.make_jaxpr(loss)(pred))
        g_got = jax.jit(jax.grad(loss))(pred)
    np.testing.assert_allclose(np.asarray(g_got), np.asarray(g_ref),
                               rtol=1e-5, atol=1e-7)


def test_ssim_unshardable_batch_falls_back(eight_devices):
    """Batch not divisible by dp: the dispatcher must keep the XLA
    formulation (GSPMD shards it freely), not die in shard_map."""
    mesh = _mesh(eight_devices)
    pred, targ = _rand((6, 32, 32, 1), 6), _rand((6, 32, 32, 1), 7)
    with mesh_context(mesh):
        jaxpr = str(jax.make_jaxpr(M.ssim_per_image)(pred, targ))
        assert "pallas_call" not in jaxpr
        got = M.ssim_per_image(pred, targ)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(M.ssim_parts_xla(pred, targ)[0]),
        rtol=1e-6, atol=1e-6)


# ---------------------------------------------------------------------------
# flash attention
# ---------------------------------------------------------------------------
def _qkv(b, h, t, d, seed):
    rng = np.random.default_rng(seed)
    mk = lambda: jnp.asarray(  # noqa: E731
        rng.normal(size=(b, h, t, d)).astype(np.float32))
    return mk(), mk(), mk()


def test_flash_attention_sharded_dispatch_and_parity(
        eight_devices, monkeypatch):
    from pai_tpu.ops import attention as A

    monkeypatch.setattr(A, "_BLOCKWISE_THRESHOLD", 2048)
    mesh = _mesh(eight_devices, tp=2)  # dp=4 (batch), tp=2 (heads)
    q, k, v = _qkv(8, 2, 2048, 16, 8)
    expect = np.asarray(A._full_attention(q, k, v))

    with mesh_context(mesh):
        jaxpr = str(jax.make_jaxpr(A.multihead_attention)(q, k, v))
        assert "pallas_call" in jaxpr, "flash kernel not dispatched"
        assert "shard_map" in jaxpr, "kernel not wrapped for the mesh"
        got = jax.jit(A.multihead_attention)(q, k, v)
    np.testing.assert_allclose(np.asarray(got), expect,
                               rtol=2e-5, atol=2e-5)


def test_flash_attention_sharded_gradients(eight_devices, monkeypatch):
    from pai_tpu.ops import attention as A

    monkeypatch.setattr(A, "_BLOCKWISE_THRESHOLD", 2048)
    mesh = _mesh(eight_devices)
    q, k, v = _qkv(8, 1, 2048, 16, 9)

    def ref_loss(q_):
        return jnp.sum(A._full_attention(q_, k, v) ** 2)

    g_ref = jax.grad(ref_loss)(q)

    with mesh_context(mesh):
        def loss(q_):
            return jnp.sum(A.multihead_attention(q_, k, v) ** 2)

        assert "pallas_call" in str(jax.make_jaxpr(loss)(q))
        g_got = jax.jit(jax.grad(loss))(q)
    np.testing.assert_allclose(np.asarray(g_got), np.asarray(g_ref),
                               rtol=2e-4, atol=2e-4)


def test_flash_attention_unshardable_falls_back(eight_devices, monkeypatch):
    """b and h both indivisible by the mesh axes: blockwise XLA fallback."""
    from pai_tpu.ops import attention as A

    monkeypatch.setattr(A, "_BLOCKWISE_THRESHOLD", 2048)
    mesh = _mesh(eight_devices, tp=2)
    q, k, v = _qkv(3, 1, 2048, 16, 10)
    with mesh_context(mesh):
        jaxpr = str(jax.make_jaxpr(A.multihead_attention)(q, k, v))
        assert "pallas_call" not in jaxpr
        got = A.multihead_attention(q, k, v)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(A._full_attention(q, k, v)),
        rtol=2e-5, atol=2e-5)
