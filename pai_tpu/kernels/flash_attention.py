"""Fused blockwise (flash) attention — forward AND backward Pallas kernels —
for the diffusion UNet's long spatial sequences (up to 128x128 = 16,384
tokens at --attention-res 2, SURVEY §5).

Forward: grid (batch*heads, q-blocks, kv-blocks); the kv axis is innermost,
so each (bh, q-block) program streams K/V panels through VMEM (auto
double-buffered) while online-softmax state (running max, denominator,
accumulator) lives in VMEM scratch — O(block) memory instead of the
reference's materialised T^2 softmax (guided_diffusion/unet.py:283-297).
The per-row log-sum-exp is emitted as a residual (lane-broadcast to satisfy
TPU tiling) so the backward never re-runs the softmax reduction.

Backward: the standard flash decomposition with delta = rowsum(dO * O)
precomputed in XLA —
    P   = exp(s^2 Q K^T - lse)
    dV  = P^T dO
    dS  = P * (dO V^T - delta)
    dQ  = s^2 dS K        (kernel 1: grid over q-blocks, kv innermost)
    dK  = s^2 dS^T Q      (kernel 2: grid over kv-blocks, q innermost)
Scaling matches QKVAttentionLegacy: logits = (q * d^-1/4) @ (k * d^-1/4)^T,
softmax in float32 (unet.py:291-295).

Measured on TPU v5e vs the XLA references: forward 1.5x faster at T=4096
(b2 h4 d64), 9.8 ms at T=16384 where full softmax cannot materialise.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pai_tpu.kernels import interpret_enabled

# lse/delta carry one value per row, broadcast across a narrow lane tile.
# Measured fwd+bwd at T=4096 b2 h4 d64 on v5e: LANES=8 4.70 ms, 128 4.84 ms
# (16x the residual memory), 1 5.56 ms (1-lane loads are slow) — 8 is the
# sweet spot and satisfies block tiling via block-dim == array-dim equality.
LANES = 8


def _block_sizes(t: int, d: int):
    """(BLOCK_Q, BLOCK_K) sizing: the f32 logits tile costs BQ*BK*4 bytes of
    VMEM; 1024^2 (4 MB + panels) is the largest tile that fits the DEFAULT
    16 MB scoped-vmem budget and measured 10.2 ms at T=16384 b1 h4 d64 on
    v5e (vs 13.1 ms at 512^2). 2048^2 (16 MB logits tile) compiles over
    that default budget; set PAI_FLASH_MAX_BLOCK=2048 to opt in — the
    pallas_calls then raise ``vmem_limit_bytes`` (docs/PERF.md records the
    measured outcome of that experiment)."""
    import os

    raw = os.environ.get("PAI_FLASH_MAX_BLOCK", "1024")
    try:
        blk = int(raw)
    except ValueError:
        blk = -1
    if blk < 128 or blk & (blk - 1):
        raise ValueError(
            f"PAI_FLASH_MAX_BLOCK={raw!r}: must be a power of two >= 128 "
            "(Mosaic tiles require power-of-two blocks). NOTE: the value "
            "is read at TRACE time — changing it after a shape has been "
            "jit-compiled has no effect on the cached executable; set it "
            "before the first attention call (or use a fresh process, as "
            "tools/flash_vmem_probe.py does).")
    while t % blk:
        blk //= 2
    return blk, blk


def _compiler_kwargs(block_q: int, block_k: int):
    """Raise the Mosaic scoped-vmem budget only when a >1024 tile was
    explicitly requested: the f32 logits tile alone is BQ*BK*4 bytes
    (16 MB at 2048^2), over the 16 MB default; v5e VMEM is 128 MB."""
    if max(block_q, block_k) <= 1024:
        return {}
    return {"compiler_params": pltpu.CompilerParams(
        vmem_limit_bytes=110 * 2 ** 20)}


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------
def _fwd_kernel(q_ref, k_ref, v_ref, o_ref, *rest, scale: float,
                emit_lse: bool):
    """``emit_lse=True`` additionally writes the per-row log-sum-exp
    residual for the backward; the inference/primal path skips it (an
    unused pallas output cannot be DCE'd by XLA, and the 100-step sampler
    calls this at T up to 16,384 with no backward ever running)."""
    if emit_lse:
        lse_ref, m_ref, l_ref, acc_ref = rest
    else:
        m_ref, l_ref, acc_ref = rest
    kv_idx = pl.program_id(2)

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

    @pl.when(kv_idx == pl.num_programs(2) - 1)
    def _():
        o_ref[0] = (acc_ref[:] / l_ref[:]).astype(o_ref.dtype)
        if emit_lse:
            lse = m_ref[:] + jnp.log(l_ref[:])      # (BLOCK_Q, 1)
            lse_ref[0] = jnp.broadcast_to(lse, lse_ref.shape[1:])


def _fwd_call(q, k, v, emit_lse: bool, interpret):
    if interpret is None:
        interpret = interpret_enabled()
    b, h, t, d = q.shape
    scale = d ** -0.25
    block_q, block_k = _block_sizes(t, d)
    qf = q.reshape(b * h, t, d)
    kf = k.reshape(b * h, t, d)
    vf = v.reshape(b * h, t, d)

    o_spec = pl.BlockSpec((1, block_q, d), lambda i, j, kv: (i, j, 0),
                          memory_space=pltpu.VMEM)
    o_shape = jax.ShapeDtypeStruct((b * h, t, d), q.dtype)
    lse_spec = pl.BlockSpec((1, block_q, LANES), lambda i, j, kv: (i, j, 0),
                            memory_space=pltpu.VMEM)
    lse_shape = jax.ShapeDtypeStruct((b * h, t, LANES), jnp.float32)

    grid = (b * h, t // block_q, t // block_k)
    result = pl.pallas_call(
        functools.partial(_fwd_kernel, scale=scale, emit_lse=emit_lse),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda i, j, kv: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, d), lambda i, j, kv: (i, kv, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, d), lambda i, j, kv: (i, kv, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(o_spec, lse_spec) if emit_lse else o_spec,
        out_shape=(o_shape, lse_shape) if emit_lse else o_shape,
        scratch_shapes=[
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, d), jnp.float32),
        ],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * t * t * d,
            bytes_accessed=(4 * b * h * t * d) * 4,
            transcendentals=b * h * t * t,
        ),
        **_compiler_kwargs(block_q, block_k),
    )(qf, kf, vf)
    if emit_lse:
        out, lse = result
        return out.reshape(b, h, t, d), lse[:, :, :1]  # (bh, t, 1)
    return result.reshape(b, h, t, d)


def _flash_forward_with_lse(q, k, v, interpret=None):
    return _fwd_call(q, k, v, emit_lse=True, interpret=interpret)


def _flash_forward(q, k, v, interpret=None):
    """q,k,v: (B, H, T, D) -> (B, H, T, D). No lse residual is written —
    this is the inference/primal path."""
    return _fwd_call(q, k, v, emit_lse=False, interpret=interpret)


# ---------------------------------------------------------------------------
# backward
# ---------------------------------------------------------------------------
def _bwd_dq_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, dq_ref,
                   dq_acc, *, scale: float):
    kv_idx = pl.program_id(2)

    @pl.when(kv_idx == 0)
    def _():
        dq_acc[:] = jnp.zeros_like(dq_acc)

    q = q_ref[0].astype(jnp.float32)
    ks = k_ref[0].astype(jnp.float32)
    vs = v_ref[0].astype(jnp.float32)
    do = do_ref[0].astype(jnp.float32)
    lse = lse_ref[0][:, :1]
    delta = delta_ref[0][:, :1]

    s2 = scale * scale
    logits = jax.lax.dot_general(
        q, ks, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * s2
    p = jnp.exp(logits - lse)
    dp = jax.lax.dot_general(
        do, vs, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
    ds = p * (dp - delta)
    dq_acc[:] += s2 * jax.lax.dot_general(
        ds, ks, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)

    @pl.when(kv_idx == pl.num_programs(2) - 1)
    def _():
        dq_ref[0] = dq_acc[:].astype(dq_ref.dtype)


def _bwd_dkv_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
                    dk_ref, dv_ref, dk_acc, dv_acc, *, scale: float):
    q_idx = pl.program_id(2)

    @pl.when(q_idx == 0)
    def _():
        dk_acc[:] = jnp.zeros_like(dk_acc)
        dv_acc[:] = jnp.zeros_like(dv_acc)

    q = q_ref[0].astype(jnp.float32)
    ks = k_ref[0].astype(jnp.float32)
    vs = v_ref[0].astype(jnp.float32)
    do = do_ref[0].astype(jnp.float32)
    lse = lse_ref[0][:, :1]
    delta = delta_ref[0][:, :1]

    s2 = scale * scale
    logits = jax.lax.dot_general(
        q, ks, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * s2
    p = jnp.exp(logits - lse)                        # (BQ, BK)
    dv_acc[:] += jax.lax.dot_general(
        p, do, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    dp = jax.lax.dot_general(
        do, vs, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
    ds = p * (dp - delta)                            # (BQ, BK)
    dk_acc[:] += s2 * jax.lax.dot_general(
        ds, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)

    @pl.when(q_idx == pl.num_programs(2) - 1)
    def _():
        dk_ref[0] = dk_acc[:].astype(dk_ref.dtype)
        dv_ref[0] = dv_acc[:].astype(dv_ref.dtype)


def _flash_backward(q, k, v, o, lse, g, interpret=None):
    if interpret is None:
        interpret = interpret_enabled()
    b, h, t, d = q.shape
    scale = d ** -0.25
    block_q, block_k = _block_sizes(t, d)
    qf = q.reshape(b * h, t, d)
    kf = k.reshape(b * h, t, d)
    vf = v.reshape(b * h, t, d)
    of = o.reshape(b * h, t, d)
    gf = g.reshape(b * h, t, d)

    delta = jnp.sum(gf.astype(jnp.float32) * of.astype(jnp.float32),
                    axis=-1, keepdims=True)          # (bh, t, 1)
    lse_b = jnp.broadcast_to(lse, (b * h, t, LANES))
    delta_b = jnp.broadcast_to(delta, (b * h, t, LANES))

    row_specs = [
        pl.BlockSpec((1, block_q, d), lambda i, j, kv: (i, j, 0),
                     memory_space=pltpu.VMEM),            # q
        pl.BlockSpec((1, block_k, d), lambda i, j, kv: (i, kv, 0),
                     memory_space=pltpu.VMEM),            # k
        pl.BlockSpec((1, block_k, d), lambda i, j, kv: (i, kv, 0),
                     memory_space=pltpu.VMEM),            # v
        pl.BlockSpec((1, block_q, d), lambda i, j, kv: (i, j, 0),
                     memory_space=pltpu.VMEM),            # do
        pl.BlockSpec((1, block_q, LANES), lambda i, j, kv: (i, j, 0),
                     memory_space=pltpu.VMEM),            # lse
        pl.BlockSpec((1, block_q, LANES), lambda i, j, kv: (i, j, 0),
                     memory_space=pltpu.VMEM),            # delta
    ]
    dq = pl.pallas_call(
        functools.partial(_bwd_dq_kernel, scale=scale),
        grid=(b * h, t // block_q, t // block_k),
        in_specs=row_specs,
        out_specs=pl.BlockSpec((1, block_q, d), lambda i, j, kv: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b * h, t, d), q.dtype),
        scratch_shapes=[pltpu.VMEM((block_q, d), jnp.float32)],
        interpret=interpret,
        **_compiler_kwargs(block_q, block_k),
    )(qf, kf, vf, gf, lse_b, delta_b)

    col_specs = [
        pl.BlockSpec((1, block_q, d), lambda i, kv, j: (i, j, 0),
                     memory_space=pltpu.VMEM),            # q
        pl.BlockSpec((1, block_k, d), lambda i, kv, j: (i, kv, 0),
                     memory_space=pltpu.VMEM),            # k
        pl.BlockSpec((1, block_k, d), lambda i, kv, j: (i, kv, 0),
                     memory_space=pltpu.VMEM),            # v
        pl.BlockSpec((1, block_q, d), lambda i, kv, j: (i, j, 0),
                     memory_space=pltpu.VMEM),            # do
        pl.BlockSpec((1, block_q, LANES), lambda i, kv, j: (i, j, 0),
                     memory_space=pltpu.VMEM),            # lse
        pl.BlockSpec((1, block_q, LANES), lambda i, kv, j: (i, j, 0),
                     memory_space=pltpu.VMEM),            # delta
    ]
    dk, dv = pl.pallas_call(
        functools.partial(_bwd_dkv_kernel, scale=scale),
        grid=(b * h, t // block_k, t // block_q),
        in_specs=col_specs,
        out_specs=(
            pl.BlockSpec((1, block_k, d), lambda i, kv, j: (i, kv, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, d), lambda i, kv, j: (i, kv, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b * h, t, d), q.dtype),
            jax.ShapeDtypeStruct((b * h, t, d), q.dtype),
        ),
        scratch_shapes=[
            pltpu.VMEM((block_k, d), jnp.float32),
            pltpu.VMEM((block_k, d), jnp.float32),
        ],
        interpret=interpret,
        **_compiler_kwargs(block_q, block_k),
    )(qf, kf, vf, gf, lse_b, delta_b)

    shape = (b, h, t, d)
    return dq.reshape(shape), dk.reshape(shape), dv.reshape(shape)


# ---------------------------------------------------------------------------
# public op
# ---------------------------------------------------------------------------
@jax.custom_vjp
def flash_attention(q, k, v):
    return _flash_forward(q, k, v)


def _flash_fwd_rule(q, k, v):
    o, lse = _flash_forward_with_lse(q, k, v)
    return o, (q, k, v, o, lse)


def _flash_bwd_rule(residuals, g):
    q, k, v, o, lse = residuals
    return _flash_backward(q, k, v, o, lse, g)


flash_attention.defvjp(_flash_fwd_rule, _flash_bwd_rule)
