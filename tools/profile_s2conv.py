"""Stride-2 conv backward: dx vs dw split, and the space-to-depth
phase-decomposed reformulation (all stride-1) as a candidate fix.

s2d form: y = conv_s1(s2d(x), K') with K'[(a,b),(p,q,c),f] = K[2a+p, 2b+q]
(zero where 2a+p > 2), padding lo=0 hi=1 per spatial dim — numerically
identical to lax stride-2 SAME for even H, W (checked in-script).
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


def gsum(g):
    import jax
    import jax.numpy as jnp
    return sum(jnp.sum(x.astype(jnp.float32) ** 2)
               for x in jax.tree_util.tree_leaves(g))


def conv_s2(x, w):
    import jax
    return jax.lax.conv_general_dilated(
        x, w, (2, 2), 'SAME', dimension_numbers=('NHWC', 'HWIO', 'NHWC'))


def conv_s2d(x, w):
    """Phase-decomposed equivalent: s2d(x) then a 2x2 stride-1 conv."""
    import jax
    import jax.numpy as jnp
    B, H, W, C = x.shape
    F = w.shape[-1]
    xs = x.reshape(B, H // 2, 2, W // 2, 2, C).transpose(0, 1, 3, 2, 4, 5)
    xs = xs.reshape(B, H // 2, W // 2, 4 * C)
    w4 = jnp.pad(w, ((0, 1), (0, 1), (0, 0), (0, 0)))
    # (4, 4, C, F) -> [(a,p),(b,q),c,f] -> (a, b, (p,q,c), f)
    w4 = w4.reshape(2, 2, 2, 2, C, F).transpose(0, 2, 1, 3, 4, 5)
    w4 = w4.reshape(2, 2, 4 * C, F)
    return jax.lax.conv_general_dilated(
        xs, w4, (1, 1), [(0, 1), (0, 1)],
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'))


def main():
    import jax
    import jax.numpy as jnp

    B = 4
    dt = jnp.bfloat16
    kr = jax.random.PRNGKey(0)

    # numeric equivalence check (f32, small)
    x0 = jax.random.normal(kr, (2, 16, 24, 5), jnp.float32)
    w0 = jax.random.normal(kr, (3, 3, 5, 7), jnp.float32) / 10
    a = np.asarray(conv_s2(x0, w0))
    b = np.asarray(conv_s2d(x0, w0))
    err = np.abs(a - b).max()
    print('s2d equivalence max err:', err, flush=True)
    assert err < 1e-4, err

    blocks = [('blk0 384x1280 c64', 384, 1280, 64),
              ('blk1 192x640 c128', 192, 640, 128),
              ('blk3 48x160 c512', 48, 160, 512)]
    for label, H, W, C in blocks:
        x = jax.jit(lambda k: jax.random.normal(
            k, (B, H, W, C), jnp.float32).astype(dt))(kr)
        w = jax.jit(lambda k: (jax.random.normal(
            k, (3, 3, C, C), jnp.float32) / np.sqrt(9 * C)).astype(dt))(kr)
        pX = lambda a, i: (a[0] + i.astype(dt) * 1e-3, a[1])

        for nm, conv in [('s2 ', conv_s2), ('s2d', conv_s2d)]:
            def fwd(x, w, conv=conv):
                return jnp.sum(conv(x, w).astype(jnp.float32) ** 2)

            scan_time(f'{label} [{nm}] fwd', fwd, pX, x, w)
            scan_time(f'{label} [{nm}] dx', lambda xx, ww, fwd=fwd: gsum(
                jax.grad(fwd, argnums=0)(xx, ww)), pX, x, w)
            scan_time(f'{label} [{nm}] dw', lambda xx, ww, fwd=fwd: gsum(
                jax.grad(fwd, argnums=1)(xx, ww)), pX, x, w)
            scan_time(f'{label} [{nm}] dx+dw', lambda xx, ww, fwd=fwd: gsum(
                jax.grad(fwd, argnums=(0, 1))(xx, ww)), pX, x, w)


if __name__ == '__main__':
    main()
