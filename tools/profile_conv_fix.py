"""Candidate fixes for the image-tower conv joint-graph penalty.

profile_s2bwd_variants.py established (blk0 s2 shape, B4 bf16):
  - XLA given-dy dx+dw are fast as graph *parameters* (A 2.7 / I 1.15 ms)
    even when loop-variant, but the joint grad-of-forward graph costs
    15.6 ms (B) — an XLA fusion/layout pathology, not recompute or dtype
    (G/F). optimization_barrier on the cotangent recovers ~6.6 ms (J).
  - The 4-shift einsum dw (conv2d._bwd fallback) is *slower* than XLA's
    native dw lowering once both are measured loop-variant (K 5.4 vs
    I 1.15) — the custom backward should route through XLA's pulls.
  - fwd alone is ~4.2 ms vs a ~0.6 ms roofline (E) — the strided conv
    forward itself is mislowered; a space-to-depth 2x2 unstrided conv
    (4C input channels, MXU-shaped) may fix it.

This profiler times the exact candidates to wire into ops/conv2d.py.
"""
import os
import sys
import time

sys.path.insert(0, os.getcwd())

import numpy as np

import epnet_tpu  # noqa: F401  (enables the persistent compile cache)

K = 6


def scan_time(name, op, perturb, *args):
    import jax
    import jax.numpy as jnp

    def run_k(k):
        @jax.jit
        def f(args):
            def body(acc, i):
                a = perturb(args, i)
                return acc + op(*a), 0.0
            acc, _ = jax.lax.scan(body, 0.0, jnp.arange(k, dtype=jnp.float32))
            return acc
        np.asarray(f(args))
        t0 = time.time()
        for _ in range(3):
            np.asarray(f(args))
        return (time.time() - t0) / 3

    t1 = run_k(1)
    tk = run_k(K)
    per = (tk - t1) / (K - 1) * 1000
    print(f'{name}: {per:.2f} ms', flush=True)
    return per


def main():
    import jax
    import jax.numpy as jnp

    B, H, W, C, F = 4, 384, 1280, 64, 64
    H2, W2 = H // 2, W // 2
    dt = jnp.bfloat16
    kr = jax.random.PRNGKey(0)

    def conv(x, w, stride):
        return jax.lax.conv_general_dilated(
            x, w, (stride, stride), 'SAME',
            dimension_numbers=('NHWC', 'HWIO', 'NHWC'))

    h = jax.jit(lambda k: jax.random.normal(
        k, (B, H, W, C), jnp.float32).astype(dt))(kr)
    w = jax.jit(lambda k: (jax.random.normal(
        k, (3, 3, C, F), jnp.float32) / np.sqrt(9 * C)).astype(dt))(kr)

    pX = lambda a, i: (a[0] + i.astype(a[0].dtype) * 1e-3,) + tuple(a[1:])

    def gsum(g):
        return sum(jnp.sum(x.astype(jnp.float32) ** 2)
                   for x in jax.tree_util.tree_leaves(g))

    barrier = jax.lax.optimization_barrier

    # ---- the exact _bwd candidate: barrier residuals + cotangent, then
    # XLA-native vjp pulls (primal of the re-vjp'd conv is dead code).
    def man(h, w, stride):
        y = conv(h, w, stride)
        dyv = 2.0 * jax.lax.stop_gradient(y)
        hb, wb, dyb = barrier((h, w, dyv))
        _, pull = jax.vjp(lambda hh, ww: conv(hh, ww, stride), hb, wb)
        dh, dw = pull(dyb)
        return jnp.sum(y.astype(jnp.float32) ** 2) * 0 + gsum((dh, dw))

    scan_time('N s2 fwd + barriered-XLA dx+dw', lambda h, w: man(h, w, 2),
              pX, h, w)
    scan_time('O s1 fwd + barriered-XLA dx+dw', lambda h, w: man(h, w, 1),
              pX, h, w)

    # ---- barrier only the cotangent (residuals untouched)
    def man_dy(h, w, stride):
        y = conv(h, w, stride)
        dyb = barrier(2.0 * jax.lax.stop_gradient(y))
        _, pull = jax.vjp(lambda hh, ww: conv(hh, ww, stride), h, w)
        dh, dw = pull(dyb)
        return gsum((dh, dw))

    scan_time('N2 s2 fwd + dy-barrier-only XLA dx+dw',
              lambda h, w: man_dy(h, w, 2), pX, h, w)

    # ---- forward reformulation: space-to-depth + 2x2 unstrided conv
    def s2d_fwd(x, w):
        Bq, Hq, Wq, Cq = x.shape
        Fq = w.shape[-1]
        xs = x.reshape(Bq, Hq // 2, 2, Wq // 2, 2, Cq)
        xs = xs.transpose(0, 1, 3, 2, 4, 5).reshape(Bq, Hq // 2, Wq // 2,
                                                    4 * Cq)
        # K'[a, b, (p, q, c), f] = K[p + 2a, q + 2b, c, f]; taps beyond the
        # 3x3 window are zero. SAME/s2 pads (0, 1): the a=1/b=1 taps read
        # one row/col past the tile -> pad hi by 1.
        kp = jnp.zeros((2, 2, 2, 2, Cq, Fq), w.dtype)
        for a in range(2):
            for b in range(2):
                for p in range(2):
                    for q in range(2):
                        d, e = p + 2 * a, q + 2 * b
                        if d <= 2 and e <= 2:
                            kp = kp.at[a, b, p, q].set(w[d, e])
        kp = kp.reshape(2, 2, 4 * Cq, Fq)
        return jax.lax.conv_general_dilated(
            xs, kp, (1, 1), ((0, 1), (0, 1)),
            dimension_numbers=('NHWC', 'HWIO', 'NHWC'))

    # numerics check
    got = np.asarray(jax.jit(s2d_fwd)(h, w), dtype=np.float32)
    want = np.asarray(jax.jit(lambda x, w: conv(x, w, 2))(h, w),
                      dtype=np.float32)
    rel = np.abs(got - want).max() / max(np.abs(want).max(), 1e-9)
    print(f's2d fwd max-rel-err {rel:.2e}', flush=True)

    scan_time('P s2d-phase fwd only', lambda h, w: gsum(
        (s2d_fwd(h, w),)), pX, h, w)
    scan_time('E2 lax s2 fwd only (control)', lambda h, w: gsum(
        (conv(h, w, 2),)), pX, h, w)
    scan_time('E3 lax s1 fwd only (control)', lambda h, w: gsum(
        (conv(h, w, 1),)), pX, h, w)

    # ---- s2d fwd + barriered grads (full candidate for s2)
    def man_s2d(h, w):
        y = s2d_fwd(h, w)
        dyv = 2.0 * jax.lax.stop_gradient(y)
        hb, wb, dyb = barrier((h, w, dyv))
        _, pull = jax.vjp(lambda hh, ww: conv(hh, ww, 2), hb, wb)
        dh, dw = pull(dyb)
        return jnp.sum(y.astype(jnp.float32) ** 2) * 0 + gsum((dh, dw))

    scan_time('Q s2d fwd + barriered-XLA dx+dw', man_s2d, pX, h, w)


if __name__ == '__main__':
    main()
