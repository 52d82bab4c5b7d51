"""Per-piece backward cost of the image tower blocks (B4 train shapes).

Each ImageBlock is conv3x3(s1)+BN+relu -> conv3x3(s2). Times, per scale:
fwd, full bwd, and isolated bwd of the stride-1 conv, the stride-2 conv,
and the BatchNorm, to locate the ~60 ms (vs 12 ms fwd) backward excess.
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


def main():
    import jax
    import jax.numpy as jnp

    B = 4
    kr = jax.random.PRNGKey(0)
    # (label, H, W, Cin, Cout) of each ImageBlock's input
    blocks = [('blk0 384x1280  3->64', 384, 1280, 3, 64),
              ('blk1 192x640  64->128', 192, 640, 64, 128),
              ('blk2 96x320  128->256', 96, 320, 128, 256),
              ('blk3 48x160  256->512', 48, 160, 256, 512)]
    dt = jnp.bfloat16

    def conv(x, w, stride):
        return jax.lax.conv_general_dilated(
            x, w, (stride, stride), 'SAME',
            dimension_numbers=('NHWC', 'HWIO', 'NHWC'))

    def bn_relu(x, sc, bi):
        m = jnp.mean(x, axis=(0, 1, 2), dtype=jnp.float32)
        d = x - m.astype(x.dtype)
        v = jnp.mean(jnp.square(d.astype(jnp.float32)), axis=(0, 1, 2))
        w = jax.lax.rsqrt(v + 1e-5) * sc
        return jnp.maximum(d * w.astype(x.dtype) + bi.astype(x.dtype), 0)

    for label, H, W, Ci, Co in blocks:
        x = jax.jit(lambda k: jax.random.normal(
            k, (B, H, W, Ci), jnp.float32).astype(dt))(kr)
        w1 = jax.jit(lambda k: (jax.random.normal(
            k, (3, 3, Ci, Co), jnp.float32) / np.sqrt(9 * Ci)).astype(dt))(kr)
        w2 = jax.jit(lambda k: (jax.random.normal(
            k, (3, 3, Co, Co), jnp.float32) / np.sqrt(9 * Co)).astype(dt))(kr)
        sc = jnp.ones((Co,), jnp.float32)
        bi = jnp.zeros((Co,), jnp.float32)
        mid = jax.jit(lambda k: jax.random.normal(
            k, (B, H, W, Co), jnp.float32).astype(dt))(kr)

        pX = lambda a, i: (a[0] + i.astype(dt) * 1e-3,) + tuple(a[1:])

        def block_fwd(x, w1, w2, sc, bi):
            h = bn_relu(conv(x, w1, 1), sc, bi)
            return jnp.sum(conv(h, w2, 2).astype(jnp.float32) ** 2)

        scan_time(f'{label} fwd', block_fwd, pX, x, w1, w2, sc, bi)
        scan_time(f'{label} full bwd', lambda *a: gsum(
            jax.grad(block_fwd, argnums=(0, 1, 2, 3, 4))(*a)), pX,
            x, w1, w2, sc, bi)

        def c1(x, w1):
            return jnp.sum(conv(x, w1, 1).astype(jnp.float32) ** 2)

        scan_time(f'{label} conv1(s1) bwd', lambda *a: gsum(
            jax.grad(c1, argnums=(0, 1))(*a)), pX, x, w1)

        def c2(h, w2):
            return jnp.sum(conv(h, w2, 2).astype(jnp.float32) ** 2)

        scan_time(f'{label} conv2(s2) bwd', lambda *a: gsum(
            jax.grad(c2, argnums=(0, 1))(*a)), pX, mid, w2)

        def bn(h, sc, bi):
            return jnp.sum(bn_relu(h, sc, bi).astype(jnp.float32) ** 2)

        scan_time(f'{label} bn bwd', lambda *a: gsum(
            jax.grad(bn, argnums=(0, 1, 2))(*a)), pX, mid, sc, bi)


if __name__ == '__main__':
    main()
