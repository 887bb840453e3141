"""Probe: flash-attention 2048² tile under a raised scoped-vmem budget.

docs/PERF.md records 1024² as the largest tile fitting the default 16 MB
Mosaic scoped-vmem budget, with 2048² "~7% faster when it fits but
compiles over budget". ``PAI_FLASH_MAX_BLOCK=2048`` now opts the kernel
into a 110 MB ``vmem_limit_bytes`` — this probe measures whether the
bigger tile actually wins end-to-end at T=16384 on the real chip
(VERDICT r4 next-item 7; keep only on a win).

Usage: python tools/flash_vmem_probe.py [T] — runs fwd (no-lse, the
sampler path) and fwd+bwd at block 1024 then 2048, prints ms medians.
"""

import os
import subprocess
import sys
import time

B, H, D = 1, 4, 64
REPEATS = 7


def run_case(t, block):
    """One (block, T) measurement in a fresh process (the env knob is read
    at trace time; a fresh process keeps the jit caches honest)."""
    code = f"""
import os, time, json
os.environ["PAI_FLASH_MAX_BLOCK"] = "{block}"
import jax, jax.numpy as jnp
from pai_tpu.kernels.flash_attention import flash_attention, _flash_forward

k1, k2, k3 = jax.random.split(jax.random.key(0), 3)
q = jax.random.normal(k1, ({B}, {H}, {t}, {D}), jnp.float32)
k = jax.random.normal(k2, ({B}, {H}, {t}, {D}), jnp.float32)
v = jax.random.normal(k3, ({B}, {H}, {t}, {D}), jnp.float32)

fwd = jax.jit(_flash_forward)
out = fwd(q, k, v); float(out.sum())
ts = []
for _ in range({REPEATS}):
    t0 = time.perf_counter(); o = fwd(q, k, v); float(o[0,0,0,0])
    ts.append((time.perf_counter() - t0) * 1e3)

grad = jax.jit(jax.grad(lambda q, k, v: flash_attention(q, k, v).sum(),
                        argnums=(0, 1, 2)))
g = grad(q, k, v); float(g[0][0,0,0,0])
tsb = []
for _ in range({REPEATS}):
    t0 = time.perf_counter(); g = grad(q, k, v); float(g[0][0,0,0,0])
    tsb.append((time.perf_counter() - t0) * 1e3)
ts.sort(); tsb.sort()
print(json.dumps({{"block": {block}, "t": {t},
                  "fwd_ms": round(ts[len(ts)//2], 2),
                  "fwdbwd_ms": round(tsb[len(tsb)//2], 2)}}))
"""
    r = subprocess.run([sys.executable, "-c", code], capture_output=True,
                       text=True, timeout=600,
                       cwd=os.path.dirname(os.path.dirname(
                           os.path.abspath(__file__))))
    out = r.stdout.strip().splitlines()
    if r.returncode != 0 or not out:
        return {"block": block, "t": t,
                "error": (r.stderr or "no output")[-2000:]}
    return out[-1]


def main():
    t = int(sys.argv[1]) if len(sys.argv) > 1 else 16384
    for block in (1024, 2048):
        t0 = time.time()
        print(run_case(t, block), f"(wall {time.time()-t0:.0f}s)",
              flush=True)


if __name__ == "__main__":
    main()
