"""Why is the joint fwd+bwd graph of one stride-2 conv ~15 ms when its
isolated pieces are ~1 ms?

At the blk0 train shape (B4, 384x1280, 64->64, bf16):
  - given-dy dx / dw each measure ~0.6 ms (tools/profile_dx_phase.py)
  - jax.grad of sum(conv(h,w,s2)^2) wrt (h,w) measures ~15.5 ms
    (tools/profile_imgblock_bwd.py)

Variants here bisect the gap: joint vs separate grads, cotangent source
(real fwd vs given dy), f32 params with bf16 compute (the flax mixed-
precision pattern), and the stride-1 control.
"""
import os
import sys
import time

sys.path.insert(0, os.getcwd())

import numpy as np

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
    w32 = jax.jit(lambda k: jax.random.normal(
        k, (3, 3, C, F), jnp.float32) / np.sqrt(9 * C))(kr)
    dy = jax.jit(lambda k: jax.random.normal(
        k, (B, H2, W2, F), jnp.float32).astype(dt))(kr)

    pX = lambda a, i: (a[0] + i.astype(a[0].dtype) * 1e-3,) + tuple(a[1:])

    def gsum(g):
        return sum(jnp.sum(x.astype(jnp.float32) ** 2)
                   for x in jax.tree_util.tree_leaves(g))

    # A: given-dy, dx and dw in ONE graph
    def given_dy_both(h, w, dy):
        _, pull = jax.vjp(lambda hh, ww: conv(hh, ww, 2), h, w)
        dh, dw = pull(dy)
        return gsum((dh, dw))

    scan_time('A given-dy dx+dw one graph', given_dy_both, pX, h, w, dy)

    # B: the 15.5 ms case — fwd + grad wrt (h, w)
    def c2(h, w):
        return jnp.sum(conv(h, w, 2).astype(jnp.float32) ** 2)

    scan_time('B grad(fwd) wrt h+w', lambda *a: gsum(
        jax.grad(c2, argnums=(0, 1))(*a)), pX, h, w)

    # C: fwd + grad wrt h only
    scan_time('C grad(fwd) wrt h', lambda *a: gsum(
        jax.grad(c2, argnums=0)(*a)), pX, h, w)

    # D: fwd + grad wrt w only
    scan_time('D grad(fwd) wrt w', lambda *a: gsum(
        jax.grad(c2, argnums=1)(*a)), pX, h, w)

    # E: fwd only (control)
    scan_time('E fwd only', lambda *a: c2(*a), pX, h, w)

    # F: f32 param cast to bf16 inside (flax mixed-precision pattern)
    def c2mp(h, w32):
        return jnp.sum(conv(h, w32.astype(dt), 2).astype(jnp.float32) ** 2)

    scan_time('F grad(fwd) wrt h+w32(mp)', lambda *a: gsum(
        jax.grad(c2mp, argnums=(0, 1))(*a)), pX, h, w32)

    # G: bf16 cotangent forced via stop-trick: dy from fwd but detached dtype
    def c2stop(h, w):
        y = conv(h, w, 2)
        dyv = 2.0 * jax.lax.stop_gradient(y)
        return jnp.sum(y * dyv)

    scan_time('G fwd + linear-cotangent grads', lambda *a: gsum(
        jax.grad(c2stop, argnums=(0, 1))(*a)), pX, h, w)

    # H: stride-1 control, joint
    def c1(h, w):
        return jnp.sum(conv(h, w, 1).astype(jnp.float32) ** 2)

    scan_time('H s1 grad(fwd) wrt h+w', lambda *a: gsum(
        jax.grad(c1, argnums=(0, 1))(*a)), pX, h, w)


if __name__ == '__main__':
    main()
