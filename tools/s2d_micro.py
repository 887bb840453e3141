"""Microbenchmark: exact space-to-depth relayout for full-res thin-channel
3x3 convs (VERDICT r2 weak #5 / next-round #5).

res18's entire cost profile is k3s1 convs at 64 channels on 256² maps
(reference ``models/res_unet.py:52-74``): at C=64 the bf16 (8,128) lane
packing is half-empty on both the K and N matmul dims, so the MXU runs at
~half rate. The exact relayout: pad the input by 1, 2x2 space-to-depth
(cells of 4C channels), then a k2s1 VALID conv whose (2,2,4C,4F) kernel is
a zero-scattered permutation of the original (3,3,C,F) weights — each
output subposition (oh,ow) consumes tap (kh,kw) from cell offset
(dh,dw) = ((oh+kh)//2, (ow+kw)//2), subrow/col ((oh+kh)%2, (ow+kw)%2).
Mathematically identical (same weights, same outputs, bit-for-bit in f32),
1.78x the MACs (16*4*C*F vs 4*9*C*F per cell) but 4x fatter channel dims.

Run on TPU:  python tools/s2d_micro.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np


def s2d(x):
    """(N,H,W,C) -> (N,H/2,W/2,4C); cell channel order (sh, sw, c)."""
    n, h, w, c = x.shape
    x = x.reshape(n, h // 2, 2, w // 2, 2, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(n, h // 2, w // 2, 4 * c)


def d2s(y):
    """Inverse of :func:`s2d`."""
    n, h, w, c4 = y.shape
    c = c4 // 4
    y = y.reshape(n, h, w, 2, 2, c)
    y = y.transpose(0, 1, 3, 2, 4, 5)
    return y.reshape(n, 2 * h, 2 * w, c)


def s2d_weights(w):
    """(3,3,C,F) -> (2,2,4C,4F) zero-scattered kernel (see module doc)."""
    _, _, c, f = w.shape
    w2 = jnp.zeros((2, 2, 4, c, 4, f), w.dtype)
    for oh in range(2):
        for ow in range(2):
            for kh in range(3):
                for kw in range(3):
                    dh, sh = divmod(oh + kh, 2)
                    dw, sw = divmod(ow + kw, 2)
                    w2 = w2.at[dh, dw, 2 * sh + sw, :, 2 * oh + ow, :].set(
                        w[kh, kw])
    return w2.reshape(2, 2, 4 * c, 4 * f)


def conv3x3(x, w):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def conv3x3_s2d(x, w2):
    n, h, wd, c = x.shape
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    xc = s2d(xp)
    yc = jax.lax.conv_general_dilated(
        xc, w2, (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return d2s(yc)


def timeit(fn, *args, iters=30):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    rng = np.random.default_rng(0)
    for (batch, img, c, f) in [(128, 256, 64, 64), (128, 128, 128, 128),
                               (32, 256, 64, 64)]:
        x = jnp.asarray(rng.standard_normal((batch, img, img, c)),
                        jnp.bfloat16)
        w = jnp.asarray(rng.standard_normal((3, 3, c, f)) * 0.05,
                        jnp.bfloat16)
        w2 = s2d_weights(w)

        # numerics: identical in f32 accumulation
        a = np.asarray(conv3x3(x[:2].astype(jnp.float32),
                               w.astype(jnp.float32)))
        b = np.asarray(conv3x3_s2d(x[:2].astype(jnp.float32),
                                   w2.astype(jnp.float32)))
        err = np.abs(a - b).max() / max(np.abs(a).max(), 1e-6)
        print(f"[{batch}x{img}²x{c}->{f}] rel err f32: {err:.2e}")

        base = jax.jit(conv3x3)
        cand = jax.jit(conv3x3_s2d)
        t_base = timeit(base, x, w)
        t_cand = timeit(cand, x, w2)

        # fwd+bwd
        def loss_base(w_, x_):
            return jnp.sum(conv3x3(x_, w_) ** 2).astype(jnp.float32)

        def loss_cand(w_, x_):
            return jnp.sum(conv3x3_s2d(x_, w_) ** 2).astype(jnp.float32)

        gb = jax.jit(jax.grad(loss_base))
        gc = jax.jit(jax.grad(loss_cand))
        t_gb = timeit(gb, w, x)
        t_gc = timeit(gc, w2, x)
        print(f"  fwd : base {t_base:7.3f} ms   s2d {t_cand:7.3f} ms "
              f"({t_base / t_cand:.2f}x)")
        print(f"  bwd : base {t_gb:7.3f} ms   s2d {t_gc:7.3f} ms "
              f"({t_gb / t_gc:.2f}x)")


if __name__ == "__main__":
    main()
