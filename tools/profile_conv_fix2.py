"""Round 3 of the image-conv lowering bisect: producer-fusion suspects.

profile_conv_fix.py left a puzzle: fwd-only measures ~5-6 ms for BOTH
strides despite the 4x FLOP difference — consistent with the elementwise
producer (the harness perturb; BN+ReLU in the real model) fusing into the
conv operand and wrecking its DMA pipeline. These variants barrier the
conv *input* to cut that fusion, plus the s1 dy-barrier-only backward
candidate that round 2 missed.
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
    dt = jnp.bfloat16
    kr = jax.random.PRNGKey(0)
    barrier = jax.lax.optimization_barrier

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

    # R: harness floor — perturb + reduce, no conv
    scan_time('R perturb+reduce floor', lambda h, w: gsum((h,)), pX, h, w)

    # T: fwd only, conv input barriered (cuts producer->conv fusion)
    scan_time('T s2 fwd, input barrier', lambda h, w: gsum(
        (conv(barrier(h), w, 2),)), pX, h, w)
    scan_time('T1 s1 fwd, input barrier', lambda h, w: gsum(
        (conv(barrier(h), w, 1),)), pX, h, w)

    # U: the full s2 candidate — input barrier + dy barrier, XLA pulls
    def full(h, w, stride):
        hb = barrier(h)
        y = conv(hb, w, stride)
        dyb = barrier(2.0 * jax.lax.stop_gradient(y))
        _, pull = jax.vjp(lambda hh, ww: conv(hh, ww, stride), hb, w)
        dh, dw = pull(dyb)
        return gsum((dh, dw))

    scan_time('U s2 in-barrier fwd + dy-barrier grads',
              lambda h, w: full(h, w, 2), pX, h, w)
    scan_time('U1 s1 in-barrier fwd + dy-barrier grads',
              lambda h, w: full(h, w, 1), pX, h, w)

    # S: s1 dy-barrier-only backward (round-2 gap)
    def man_dy(h, w, stride):
        y = conv(h, w, stride)
        dyb = barrier(2.0 * jax.lax.stop_gradient(y))
        _, pull = jax.vjp(lambda hh, ww: conv(hh, ww, stride), h, w)
        dh, dw = pull(dyb)
        return gsum((dh, dw))

    scan_time('S s1 fwd + dy-barrier-only grads',
              lambda h, w: man_dy(h, w, 1), pX, h, w)


if __name__ == '__main__':
    main()
