"""Spatial self-attention for the diffusion UNet.

The reference materialises the full O(T^2) softmax
(``models/guided_diffusion/unet.py:276-297``), surviving only via always-on
gradient checkpointing (``unet.py:254``). With the CLI-default
``--attention-res 8,4,2`` attention runs on up to 128x128 = 16,384 tokens
(SURVEY §5), where a materialised 16384^2 weight tensor is ~1 GB per head per
image — so the TPU rebuild uses an online-softmax *blockwise* formulation for
long sequences: numerically identical, O(T * block) memory, and written
blockwise so a future sequence-sharded (ring) variant is a follow-on rather
than a rewrite. A fused Pallas kernel (``pai_tpu.kernels.flash_attention``)
is used on TPU for the long-sequence path; this module is the XLA reference
and fallback.

Scaling matches QKVAttentionLegacy: q and k are each scaled by
``ch**-0.25`` before the product (== logits / sqrt(head_dim)), softmax in
float32 (``unet.py:291-295``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from pai_tpu.parallel.context import get_mesh_context, mesh_context, \
    set_mesh_context

# Sequences at or above this length take the blockwise path.
_BLOCKWISE_THRESHOLD = 4096
_Q_BLOCK = 1024
_KV_BLOCK = 1024


def set_sequence_mesh(mesh, axis: str = "sp") -> None:
    """Install (or clear, with ``mesh=None``) the mesh whose ``axis`` tokens
    are sharded over. The Trainer sets this when ``--sp > 1``; it takes
    effect at trace time for every subsequent ``multihead_attention``.
    (Thin wrapper over :mod:`pai_tpu.parallel.context` — the context is a
    ContextVar, so concurrent Trainers each see their own.)"""
    set_mesh_context(mesh, sp_axis=axis if mesh is not None else None)


class sequence_parallel(mesh_context):
    """Scoped form of :func:`set_sequence_mesh` (tests)."""

    def __init__(self, mesh, axis: str = "sp"):
        super().__init__(mesh, sp_axis=axis)


def _sequence_parallel_attention(q, k, v, mesh, axis):
    """Ring attention over the mesh's 'sp' axis; batch stays sharded
    over 'dp' when the mesh has one (each dp group runs its own ring)."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    from pai_tpu.parallel.ring_attention import ring_attention

    b = q.shape[0]
    dp = ("dp" if "dp" in mesh.axis_names and mesh.shape["dp"] > 1
          and b % mesh.shape["dp"] == 0 else None)
    spec = P(dp, None, axis, None)
    fn = shard_map(
        functools.partial(ring_attention, axis_name=axis),
        mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec,
        check_vma=False)
    return fn(q, k, v)


def _full_attention(q, k, v):
    """Reference full-softmax attention. q,k,v: (B, H, T, D), f32 softmax."""
    d = q.shape[-1]
    scale = d ** -0.25
    logits = jnp.einsum(
        "bhqd,bhkd->bhqk", q * scale, k * scale,
        preferred_element_type=jnp.float32,
    )
    weights = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    return jnp.einsum(
        "bhqk,bhkd->bhqd", weights.astype(v.dtype), v,
        preferred_element_type=jnp.float32,
    ).astype(v.dtype)


def _blockwise_attention(q, k, v, q_block: int, kv_block: int):
    """Online-softmax blockwise attention (exact, not approximate)."""
    b, h, t, d = q.shape
    scale = d ** -0.25
    q = q * scale
    k = k * scale
    num_kv = t // kv_block

    def process_q_block(q_blk):
        # q_blk: (B, H, q_block, D)
        def kv_step(carry, kv_idx):
            m_prev, l_prev, acc_prev = carry
            ks = jax.lax.dynamic_slice_in_dim(k, kv_idx * kv_block,
                                              kv_block, axis=2)
            vs = jax.lax.dynamic_slice_in_dim(v, kv_idx * kv_block,
                                              kv_block, axis=2)
            logits = jnp.einsum(
                "bhqd,bhkd->bhqk", q_blk, ks,
                preferred_element_type=jnp.float32,
            ).astype(jnp.float32)
            m_cur = jnp.max(logits, axis=-1, keepdims=True)
            m_new = jnp.maximum(m_prev, m_cur)
            p = jnp.exp(logits - m_new)
            alpha = jnp.exp(m_prev - m_new)
            l_new = l_prev * alpha + jnp.sum(p, axis=-1, keepdims=True)
            acc_new = acc_prev * alpha + jnp.einsum(
                "bhqk,bhkd->bhqd", p, vs.astype(jnp.float32),
                preferred_element_type=jnp.float32,
            )
            return (m_new, l_new, acc_new), None

        init = (
            jnp.full((b, h, q_blk.shape[2], 1), -jnp.inf, jnp.float32),
            jnp.zeros((b, h, q_blk.shape[2], 1), jnp.float32),
            jnp.zeros((b, h, q_blk.shape[2], d), jnp.float32),
        )
        (m, l, acc), _ = jax.lax.scan(
            jax.checkpoint(kv_step), init, jnp.arange(num_kv))
        return (acc / l).astype(v.dtype)

    num_q = t // q_block
    q_blocks = q.reshape(b, h, num_q, q_block, d).transpose(2, 0, 1, 3, 4)
    out = jax.lax.map(process_q_block, q_blocks)
    return out.transpose(1, 2, 0, 3, 4).reshape(b, h, t, d)


def _sharded_flash_attention(q, k, v, mesh):
    """Per-shard flash kernels on a multi-device mesh: batch over 'dp',
    heads over 'tp' (both embarrassingly parallel in the kernel's grid).
    A bare pallas_call carries no GSPMD partitioning spec, so the wrap is
    what lets dp/tp meshes keep the kernel instead of falling back to the
    XLA blockwise formulation. Returns None when neither axis divides its
    dimension (caller falls back)."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    from pai_tpu.kernels.flash_attention import flash_attention

    b, h = q.shape[0], q.shape[1]
    dp = mesh.shape.get("dp", 1)
    tp = mesh.shape.get("tp", 1)
    bspec = "dp" if dp > 1 and b % dp == 0 else None
    hspec = "tp" if tp > 1 and h % tp == 0 else None
    if bspec is None and hspec is None:
        return None
    spec = P(bspec, hspec, None, None)
    fn = shard_map(flash_attention, mesh=mesh,
                   in_specs=(spec, spec, spec), out_specs=spec,
                   check_vma=False)
    return fn(q, k, v)


def multihead_attention(q, k, v, use_pallas: bool = True):
    """Self-attention over (B, H, T, D) with automatic long-sequence path.

    For T >= 4096 dispatches to the Pallas flash kernel on TPU (exact parity
    with the blockwise XLA path, tested) — directly on a single chip,
    wrapped in ``shard_map`` over batch/heads on a dp/tp mesh (installed
    via :mod:`pai_tpu.parallel.context`). Otherwise the blockwise XLA
    formulation; short sequences use the straightforward full softmax.
    """
    t = q.shape[2]
    ctx = get_mesh_context()
    if (ctx is not None and ctx.sp_axis is not None
            and ctx.mesh.shape.get(ctx.sp_axis, 1) > 1
            and t % ctx.mesh.shape[ctx.sp_axis] == 0):
        return _sequence_parallel_attention(q, k, v, ctx.mesh, ctx.sp_axis)
    if t < _BLOCKWISE_THRESHOLD or t % _KV_BLOCK or t % _Q_BLOCK:
        return _full_attention(q, k, v)
    if use_pallas:
        from pai_tpu.kernels import kernels_available

        if kernels_available():
            try:
                from pai_tpu.kernels.flash_attention import flash_attention
            except ImportError:
                flash_attention = None  # pallas module absent: XLA fallback
            if flash_attention is not None:
                # kernel calls stay OUTSIDE the try: a real kernel defect
                # must propagate, not silently fall back to the slow path
                if jax.device_count() == 1:
                    return flash_attention(q, k, v)
                if ctx is not None and ctx.mesh.size > 1:
                    out = _sharded_flash_attention(q, k, v, ctx.mesh)
                    if out is not None:
                        return out
    return _blockwise_attention(q, k, v, _Q_BLOCK, _KV_BLOCK)
