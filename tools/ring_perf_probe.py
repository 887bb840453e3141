"""Measured basis for the PERF.md flash-in-ring (T=16k, sp=2) entry.

One real chip: measures (a) the full T=16384 flash attention fwd and
fwd+bwd, and (b) the exact per-hop work an sp=2 device executes inside
ring_attention's flash path — forward hop `_flash_forward_with_lse` on
(Q 8192 x KV 8192) and backward hop `_flash_backward` on the same block.
The sp=2 ring step = 2 fwd hops + lse merge (elementwise, measured) per
device, + 2 ppermutes of the 8192-token KV shard (ICI, analytic — no
multi-chip here). Also contrasts the einsum hop (materialised 8192^2
logits) at reduced B*H to show the memory/runtime asymptote the flash
hop removes.

Run from anywhere: ``python tools/ring_perf_probe.py``.
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import jax
import jax.numpy as jnp

from pai_tpu.kernels.flash_attention import (
    _flash_backward, _flash_forward_with_lse, flash_attention)

B, H, D = 4, 4, 32
T = 16384
TL = T // 2  # per-device tokens at sp=2
DTYPE = jnp.bfloat16

key = jax.random.key(0)
kq, kk, kv, kg = jax.random.split(key, 4)


def sync(x):
    return float(jnp.sum(x.astype(jnp.float32)[..., ::256, 0]))


def timeit(fn, *args, reps=5):
    out = fn(*args)
    sync(out[0] if isinstance(out, tuple) else out)  # compile+warm
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    sync(out[0] if isinstance(out, tuple) else out)
    return (time.perf_counter() - t0) / reps * 1e3  # ms


# ---- full-sequence flash, T=16384 ----------------------------------------
q = jax.random.normal(kq, (B, H, T, D), DTYPE)
k = jax.random.normal(kk, (B, H, T, D), DTYPE)
v = jax.random.normal(kv, (B, H, T, D), DTYPE)

fwd = jax.jit(flash_attention)
ms_full_fwd = timeit(fwd, q, k, v)

loss_grad = jax.jit(jax.grad(lambda a, b_, c: jnp.sum(
    flash_attention(a, b_, c).astype(jnp.float32) ** 2)))
ms_full_fb = timeit(loss_grad, q, k, v)

# ---- per-hop work of an sp=2 device ---------------------------------------
qh = q[:, :, :TL]
kh = k[:, :, :TL]
vh = v[:, :, :TL]

hop_fwd = jax.jit(lambda a, b_, c: _flash_forward_with_lse(a, b_, c))
ms_hop_fwd = timeit(hop_fwd, qh, kh, vh)

o_hop, lse_hop = hop_fwd(qh, kh, vh)
g = jax.random.normal(kg, qh.shape, DTYPE)
hop_bwd = jax.jit(lambda a, b_, c, o, l, gg: _flash_backward(
    a, b_, c, o, l, gg))
ms_hop_bwd = timeit(hop_bwd, qh, kh, vh, o_hop, lse_hop, g)

# lse merge of two hops (the only non-kernel compute in the fwd ring)
lse4 = lse_hop.reshape(B, H, TL, 1)


def merge(o1, l1, o2, l2):
    ln = jnp.logaddexp(l1, l2)
    return (o1.astype(jnp.float32) * jnp.exp(l1 - ln)
            + o2.astype(jnp.float32) * jnp.exp(l2 - ln)).astype(DTYPE)


ms_merge = timeit(jax.jit(merge), o_hop, lse4, o_hop, lse4)

# ---- einsum hop contrast (B*H reduced 4x to fit the logits tile) ---------
qe, ke, ve = qh[:1], kh[:1], vh[:1]


def einsum_hop(a, b_, c):
    s = (a.astype(jnp.float32) * (D ** -0.25)) @ (
        b_.astype(jnp.float32) * (D ** -0.25)).swapaxes(-1, -2)
    m = jnp.max(s, -1, keepdims=True)
    p = jnp.exp(s - m)
    return (p @ c.astype(jnp.float32)).astype(DTYPE)


ms_einsum_quarter = timeit(jax.jit(einsum_hop), qe, ke, ve)

kv_shard_mb = 2 * B * H * TL * D * 2 / 2**20  # K and V, bf16

print(f"backend={jax.default_backend()} dtype=bf16 B={B} H={H} D={D}")
print(f"full  T={T}: flash fwd {ms_full_fwd:.2f} ms, "
      f"fwd+bwd {ms_full_fb:.2f} ms")
print(f"hop T_local={TL}: flash fwd {ms_hop_fwd:.2f} ms, "
      f"flash bwd {ms_hop_bwd:.2f} ms, lse merge {ms_merge:.3f} ms")
print(f"sp=2 fwd ring per device = 2x{ms_hop_fwd:.2f} + merge "
      f"= {2 * ms_hop_fwd + ms_merge:.2f} ms compute "
      f"(+ 2 ppermutes of {kv_shard_mb:.0f} MiB KV shard on ICI)")
print(f"einsum hop at B*H/4: {ms_einsum_quarter:.2f} ms "
      f"(x4 ~= {4 * ms_einsum_quarter:.2f} ms full-rate; logits tile "
      f"{TL * TL * 4 / 2**30:.1f} GiB/f32/bh head-pair)")
