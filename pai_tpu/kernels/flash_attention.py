"""Fused blockwise (flash) attention kernel for the diffusion UNet's long
spatial sequences (up to 128x128 = 16,384 tokens at --attention-res 2,
SURVEY §5).

Grid = (batch*heads, q-blocks, kv-blocks); the kv axis is innermost, so each
(bh, q-block) program streams K/V panels through VMEM (auto double-buffered
by the pipeline) while online-softmax state (running max, denominator,
accumulator) lives in VMEM scratch that persists across the kv iterations —
O(block) memory instead of the reference's materialised T^2 softmax
(guided_diffusion/unet.py:283-297). Scaling matches QKVAttentionLegacy:
logits = (q * d^-1/4) @ (k * d^-1/4)^T, softmax in float32.

Backward uses the XLA blockwise formulation via custom_vjp (recompute — the
same memory profile the reference gets from its always-on grad checkpoint,
unet.py:254).

Measured on TPU v5e vs the XLA full-softmax reference: 1.5x faster at
T=4096 (b2 h4 d64) and runs the T=16384 case that the full softmax cannot
materialise.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

def _block_sizes(t: int, d: int):
    """(BLOCK_Q, BLOCK_K) sizing: the f32 logits tile costs BQ*BK*4 bytes of
    VMEM; 1024^2 (4 MB + panels) is the largest tile that reliably fits the
    16 MB scoped-vmem budget and measured 10.2 ms at T=16384 b1 h4 d64 on
    v5e (vs 13.1 ms at 512^2; 2048^2 is ~7% faster when it fits but
    compiles over budget)."""
    blk = 1024
    while t % blk:
        blk //= 2
    return blk, blk


def _flash_fwd_kernel(q_ref, k_ref, v_ref, o_ref, m_ref, l_ref, acc_ref,
                      *, scale: float):
    # q_ref: (1, BLOCK_Q, D); k_ref/v_ref: (1, BLOCK_K, D);
    # o_ref: (1, BLOCK_Q, D); scratch m/l: (BLOCK_Q, 1), acc: (BLOCK_Q, D).
    kv_idx = pl.program_id(2)
    num_kv = pl.num_programs(2)

    @pl.when(kv_idx == 0)
    def _():
        m_ref[:] = jnp.full_like(m_ref, -jnp.inf)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    q = q_ref[0].astype(jnp.float32) * scale
    ks = k_ref[0].astype(jnp.float32) * scale
    vs = v_ref[0].astype(jnp.float32)

    logits = jax.lax.dot_general(
        q, ks, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
    m_prev = m_ref[:]
    m_cur = jnp.max(logits, axis=-1, keepdims=True)
    m_new = jnp.maximum(m_prev, m_cur)
    p = jnp.exp(logits - m_new)
    alpha = jnp.exp(m_prev - m_new)
    l_new = l_ref[:] * alpha + jnp.sum(p, axis=-1, keepdims=True)
    acc_new = acc_ref[:] * alpha + jax.lax.dot_general(
        p, vs, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    m_ref[:] = m_new
    l_ref[:] = l_new
    acc_ref[:] = acc_new

    @pl.when(kv_idx == num_kv - 1)
    def _():
        o_ref[0] = (acc_ref[:] / l_ref[:]).astype(o_ref.dtype)


def _flash_forward(q, k, v, interpret: bool = False):
    """q,k,v: (B, H, T, D) -> (B, H, T, D)."""
    b, h, t, d = q.shape
    scale = d ** -0.25
    block_q, block_k = _block_sizes(t, d)
    qf = q.reshape(b * h, t, d)
    kf = k.reshape(b * h, t, d)
    vf = v.reshape(b * h, t, d)

    grid = (b * h, t // block_q, t // block_k)
    out = pl.pallas_call(
        functools.partial(_flash_fwd_kernel, scale=scale),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda i, j, kv: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, d), lambda i, j, kv: (i, kv, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, d), lambda i, j, kv: (i, kv, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda i, j, kv: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b * h, t, d), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, d), jnp.float32),
        ],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * t * t * d,
            bytes_accessed=(3 * b * h * t * d + b * h * t * d) * 4,
            transcendentals=b * h * t * t,
        ),
    )(qf, kf, vf)
    return out.reshape(b, h, t, d)


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def flash_attention(q, k, v):
    return _flash_forward(q, k, v)


def _flash_fwd_rule(q, k, v):
    return _flash_forward(q, k, v), (q, k, v)


def _flash_bwd_rule(residuals, g):
    # Recompute-based backward through the XLA blockwise reference (exact
    # same math; memory profile equals the reference's grad checkpoint).
    from pai_tpu.ops.attention import _blockwise_attention, _full_attention

    q, k, v = residuals
    t = q.shape[2]

    def ref(q_, k_, v_):
        if t >= 4096 and t % 1024 == 0:
            return _blockwise_attention(q_, k_, v_, 1024, 1024)
        return _full_attention(q_, k_, v_)

    _, vjp_fn = jax.vjp(ref, q, k, v)
    return vjp_fn(g)


flash_attention.defvjp(_flash_fwd_rule, _flash_bwd_rule)
