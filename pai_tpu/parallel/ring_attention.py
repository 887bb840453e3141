"""Ring (sequence-parallel) attention over a mesh axis.

The blockwise online-softmax attention (``pai_tpu.ops.attention``) extended
across chips: tokens are sharded over the mesh axis ``sp``; each device
holds its Q shard and streams the K/V shards around the ring with
``jax.lax.ppermute`` (ICI neighbor exchange), folding every visiting shard
into the running softmax state. Exact — not an approximation — and
FLOP-balanced for the non-causal attention this framework uses
(guided_diffusion attention has no mask, unet.py:276-297).

Two hop implementations, dispatched by shard size:

* **Pallas flash hop** (``t_local >= _FLASH_RING_THRESHOLD``): each hop runs
  the fused flash kernel (``pai_tpu.kernels.flash_attention``) on the local
  Q block x visiting K/V shard, returning the hop's normalised output and
  log-sum-exp; hops merge exactly via
  ``o = o_prev*exp(lse_prev-lse_new) + o_hop*exp(lse_hop-lse_new)`` with
  ``lse_new = logaddexp`` — the same online-softmax algebra, associatively
  regrouped. O(block) memory per hop instead of a materialised
  (T_local x T_local) logits tile. The backward is a second ring: each
  device streams K/V again, computes per-hop (dQ, dK, dV) with the flash
  backward kernels (delta = rowsum(dO*O) and the GLOBAL lse make each
  hop's softmax weights exact), accumulates dQ locally, and circulates the
  visiting shard's (dK, dV) accumulators around the ring so after n hops
  they arrive back at their home device having collected every device's
  contribution.
* **XLA einsum hop** (small shards, hosts without a TPU and with interpret
  mode off): the original materialised-logits fold, kept as reference and
  fallback.

SURVEY §5 notes the reference's largest attention is 16,384 tokens on one
device; this component is what makes longer-than-HBM sequence scaling a
configuration change rather than a rewrite. Use inside ``shard_map`` with
q/k/v sharded as ``P(None, None, 'sp', None)``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

# Shards at or above this token count take the Pallas flash hop (must also
# tile cleanly: t_local % 128 == 0). Below it the einsum hop's logits tile
# is small enough that kernel dispatch overhead dominates.
_FLASH_RING_THRESHOLD = 2048


def _ring_perm(n: int):
    return [(i, (i + 1) % n) for i in range(n)]


def _ring_attention_xla(q, k, v, axis_name: str = "sp"):
    """Einsum-hop ring: exact multi-head attention with q,k,v
    sequence-sharded on ``axis_name``. Shapes per device: (B, H, T_local,
    D). Scaling matches QKVAttentionLegacy (d^-1/4 on each operand, f32
    softmax)."""
    n = jax.lax.psum(1, axis_name)
    b, h, t_local, d = q.shape
    scale = d ** -0.25
    qs = (q * scale).astype(jnp.float32)

    perm = _ring_perm(n)

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


# ---------------------------------------------------------------------------
# flash-hop ring (Pallas kernels inside the ring)
# ---------------------------------------------------------------------------
def _ring_flash_fwd_impl(axis_name, q, k, v):
    from pai_tpu.kernels.flash_attention import _flash_forward_with_lse

    n = jax.lax.psum(1, axis_name)
    b, h, t, d = q.shape
    perm = _ring_perm(n)

    def step(carry, _):
        o_prev, lse_prev, ks, vs = carry
        o_hop, lse_hop = _flash_forward_with_lse(q, ks, vs)
        lse_hop = lse_hop.reshape(b, h, t, 1)
        # exact merge of two normalised partial attentions:
        # o_i = S_i / Z_i with Z_i = exp(lse_i)  =>
        # (S_p + S_h)/(Z_p + Z_h) = o_p*exp(lse_p-lse_new) + o_h*exp(...)
        lse_new = jnp.logaddexp(lse_prev, lse_hop)
        o_new = (o_prev * jnp.exp(lse_prev - lse_new)
                 + o_hop.astype(jnp.float32) * jnp.exp(lse_hop - lse_new))
        ks = jax.lax.ppermute(ks, axis_name, perm)
        vs = jax.lax.ppermute(vs, axis_name, perm)
        return (o_new, lse_new, ks, vs), None

    init = (
        jnp.zeros((b, h, t, d), jnp.float32),
        jnp.full((b, h, t, 1), -jnp.inf, jnp.float32),
        k, v,
    )
    (o, lse, _, _), _ = jax.lax.scan(step, init, None, length=n)
    return o.astype(v.dtype), lse


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _ring_attention_flash(axis_name, q, k, v):
    o, _ = _ring_flash_fwd_impl(axis_name, q, k, v)
    return o


def _ring_flash_fwd_rule(axis_name, q, k, v):
    o, lse = _ring_flash_fwd_impl(axis_name, q, k, v)
    return o, (q, k, v, o, lse)


def _ring_flash_bwd_rule(axis_name, residuals, g):
    from pai_tpu.kernels.flash_attention import _flash_backward

    q, k, v, o, lse = residuals
    n = jax.lax.psum(1, axis_name)
    b, h, t, d = q.shape
    perm = _ring_perm(n)
    lse_flat = lse.reshape(b * h, t, 1)

    def step(carry, _):
        dq, ks, vs, dk, dv = carry
        # the GLOBAL lse makes each hop's p = exp(s^2 qk^T - lse) the
        # globally-normalised softmax block, so per-hop grads are exact
        # contributions; delta = rowsum(g*o) is hop-independent.
        dq_hop, dk_hop, dv_hop = _flash_backward(q, ks, vs, o, lse_flat, g)
        dq = dq + dq_hop.astype(jnp.float32)
        dk = dk + dk_hop.astype(jnp.float32)
        dv = dv + dv_hop.astype(jnp.float32)
        # K/V stream forward; their grad accumulators travel WITH them so
        # each lands back on its home device after n hops, having
        # collected every device's contribution.
        ks = jax.lax.ppermute(ks, axis_name, perm)
        vs = jax.lax.ppermute(vs, axis_name, perm)
        dk = jax.lax.ppermute(dk, axis_name, perm)
        dv = jax.lax.ppermute(dv, axis_name, perm)
        return (dq, ks, vs, dk, dv), None

    zeros = jnp.zeros((b, h, t, d), jnp.float32)
    init = (zeros, k, v, zeros, zeros)
    (dq, _, _, dk, dv), _ = jax.lax.scan(step, init, None, length=n)
    return dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype)


_ring_attention_flash.defvjp(_ring_flash_fwd_rule, _ring_flash_bwd_rule)


def _flash_hop_eligible(t_local: int) -> bool:
    if t_local < _FLASH_RING_THRESHOLD or t_local % 128:
        return False
    from pai_tpu.kernels import kernels_available

    return kernels_available()


def ring_attention(q, k, v, axis_name: str = "sp"):
    """Exact ring attention; per-hop compute is the Pallas flash kernel
    when the local shard is long enough to pay for it (and a kernel can
    execute here), the XLA einsum fold otherwise."""
    if _flash_hop_eligible(q.shape[2]):
        return _ring_attention_flash(axis_name, q, k, v)
    return _ring_attention_xla(q, k, v, axis_name)


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
