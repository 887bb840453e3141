"""Ring (sequence-parallel) attention over a mesh axis.

The blockwise online-softmax attention (``pai_tpu.ops.attention``) extended
across chips: tokens are sharded over the mesh axis ``sp``; each device
holds its Q shard and streams the K/V shards around the ring with
``jax.lax.ppermute`` (ICI neighbor exchange), folding every visiting shard
into the running (max, denominator, accumulator) state. Exact — not an
approximation — and FLOP-balanced for the non-causal attention this
framework uses (guided_diffusion attention has no mask, unet.py:276-297).

SURVEY §5 notes the reference's largest attention is 16,384 tokens on one
device; this component is what makes longer-than-HBM sequence scaling a
configuration change rather than a rewrite. Use inside ``shard_map`` with
q/k/v sharded as ``P(None, None, 'sp', None)``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def ring_attention(q, k, v, axis_name: str = "sp"):
    """Exact multi-head attention with q,k,v sequence-sharded on
    ``axis_name``. Shapes per device: (B, H, T_local, D). Scaling matches
    QKVAttentionLegacy (d^-1/4 on each operand, f32 softmax)."""
    n = jax.lax.psum(1, axis_name)
    b, h, t_local, d = q.shape
    scale = d ** -0.25
    qs = (q * scale).astype(jnp.float32)

    perm = [(i, (i + 1) % n) for i in range(n)]

    def step(carry, _):
        m_prev, l_prev, acc_prev, ks, vs = carry
        logits = jnp.einsum(
            "bhqd,bhkd->bhqk", qs, ks.astype(jnp.float32) * scale,
            preferred_element_type=jnp.float32)
        m_cur = jnp.max(logits, axis=-1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        p = jnp.exp(logits - m_new)
        alpha = jnp.exp(m_prev - m_new)
        l_new = l_prev * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc_new = acc_prev * alpha + jnp.einsum(
            "bhqk,bhkd->bhqd", p, vs.astype(jnp.float32),
            preferred_element_type=jnp.float32)
        # pass the K/V shard to the next device on the ring (ICI neighbor)
        ks = jax.lax.ppermute(ks, axis_name, perm)
        vs = jax.lax.ppermute(vs, axis_name, perm)
        return (m_new, l_new, acc_new, ks, vs), None

    init = (
        jnp.full((b, h, t_local, 1), -jnp.inf, jnp.float32),
        jnp.zeros((b, h, t_local, 1), jnp.float32),
        jnp.zeros((b, h, t_local, d), jnp.float32),
        k, v,
    )
    (m, l, acc, _, _), _ = jax.lax.scan(step, init, None, length=n)
    return (acc / l).astype(v.dtype)


def sequence_sharded_attention(mesh, q, k, v, axis_name: str = "sp"):
    """Convenience wrapper: run ring_attention under shard_map with
    (B, H, T, D) inputs sharded over ``axis_name`` on the token axis."""
    from jax.sharding import PartitionSpec as P
    from jax import shard_map

    spec = P(None, None, axis_name, None)
    fn = shard_map(
        functools.partial(ring_attention, axis_name=axis_name),
        mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec,
        check_vma=False)
    return fn(q, k, v)
