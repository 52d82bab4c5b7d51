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

    # ---- round-3 follow-ups: is "isolated dw is fast" a loop-invariance
    # artifact (dy fixed across the scan lets XLA hoist a layout
    # conversion), and does an optimization_barrier on the in-graph
    # cotangent restore the fast path?

    pXD = lambda a, i: (a[0] + i.astype(a[0].dtype) * 1e-3,
                        a[1],
                        a[2] + i.astype(a[2].dtype) * 1e-3) + tuple(a[3:])

    def dw_xla(h, w, dy):
        _, pull = jax.vjp(lambda ww: conv(h, ww, 2), w)
        dw, = pull(dy)
        return gsum((dw,))

    # I: given-dy dw, BOTH x and dy perturbed (loop-variant parameters)
    scan_time('I given-dy dw, x+dy variant', dw_xla, pXD, h, w, dy)

    # I2: given-dy dw, only x perturbed (the original "isolated" setup)
    scan_time('I2 given-dy dw, x variant', dw_xla, pX, h, w, dy)

    # J: fwd + XLA dw with an optimization_barrier on the cotangent
    def c2stop_barrier(h, w):
        y = conv(h, w, 2)
        dyv = jax.lax.optimization_barrier(2.0 * jax.lax.stop_gradient(y))
        return jnp.sum(y * dyv)

    scan_time('J fwd+grads, barrier on dy', lambda *a: gsum(
        jax.grad(c2stop_barrier, argnums=(0, 1))(*a)), pX, h, w)

    # K: 4-shift einsum dw (conv2d._bwd fallback), given-dy loop-variant
    def dw_einsum(x, dy):
        B_, H_, W_, C_ = x.shape
        H2_, W2_ = H_ // 2, W_ // 2
        xs = x.reshape(B_, H2_, 2, W2_, 2, C_).transpose(0, 1, 3, 2, 4, 5)
        xs = xs.reshape(B_, H2_, W2_, 4 * C_)
        xs = jnp.pad(xs, ((0, 0), (0, 1), (0, 1), (0, 0)))
        acc = 0.0
        for a in range(2):
            for b in range(2):
                win = jax.lax.dynamic_slice(
                    xs, (0, a, b, 0), (B_, H2_, W2_, 4 * C_))
                acc = acc + gsum((jnp.einsum(
                    'bhwk,bhwf->kf', win, dy,
                    preferred_element_type=jnp.float32),))
        return acc

    scan_time('K einsum dw, x+dy variant',
              lambda h, w, dy: dw_einsum(h, dy), pXD, h, w, dy)

    # L: fwd + einsum dw, live cotangent (the model's actual joint shape)
    def fwd_einsum_dw(h, w):
        y = conv(h, w, 2)
        dyv = 2.0 * jax.lax.stop_gradient(y)
        return dw_einsum(h, dyv)

    scan_time('L fwd + einsum dw, live dy', fwd_einsum_dw, pX, h, w)

    # M: L with a barrier on the cotangent
    def fwd_einsum_dw_barrier(h, w):
        y = conv(h, w, 2)
        dyv = jax.lax.optimization_barrier(2.0 * jax.lax.stop_gradient(y))
        return dw_einsum(h, dyv)

    scan_time('M fwd + einsum dw, barrier dy', fwd_einsum_dw_barrier, pX, h, w)


if __name__ == '__main__':
    main()
