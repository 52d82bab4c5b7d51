"""Scan-timed backward-pass suspects at B4 train shapes (squared losses: a linear loss has a constant cotangent and the whole VJP hoists out of the timing scan).

The train bisect shows bwd ~260 ms vs fwd ~77 (3.4x): something in the
backward is pathological. Each candidate VJP is timed as grad of a scalar
through the op, with ALL cotangents consumed (sum of squares of every grad
leaf) so nothing is DCE'd.
"""
import os
import sys
import time

sys.path.insert(0, os.getcwd())

import numpy as np

K = 11


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

    from epnet_tpu.ops.pointops import (gather_points, group_points,
                                        three_interpolate)

    B = 4
    kr = jax.random.PRNGKey(0)
    mk = lambda shape, dt=jnp.float32: jax.jit(
        lambda k: jax.random.normal(k, shape, jnp.float32).astype(dt))(kr)
    pX = lambda a, i: (a[0] + i * 1e-5,) + a[1:]

    # sa1 grouping bwd: scatter-add into (4, 4096, 99)
    tbl = mk((B, 4096, 99))
    idx = jax.jit(lambda k: jax.random.randint(k, (B, 1024, 48), 0, 4096,
                                               jnp.int32))(kr)
    scan_time('sa1 group fwd', lambda t: jnp.sum(group_points(t, idx)), pX, tbl)
    scan_time('sa1 group bwd (scatter-add 4x1024x48 -> 4096)',
              lambda t: gsum(jax.grad(
                  lambda tt: jnp.sum(group_points(tt, idx) ** 2))(t)), pX, tbl)

    # sa0 grouping bwd does NOT exist in training (xyz has no param path),
    # but measure it anyway as the worst case: (4, 16384, 19) table
    tbl0 = mk((B, 16384, 19))
    idx0 = jax.jit(lambda k: jax.random.randint(k, (B, 4096, 48), 0, 16384,
                                                jnp.int32))(kr)
    scan_time('sa0-like group bwd (scatter 4x4096x48 -> 16384)',
              lambda t: gsum(jax.grad(
                  lambda tt: jnp.sum(group_points(tt, idx0) ** 2))(t)), pX, tbl0)

    # fp0 three_interpolate bwd: scatter into (4, 4096, 128) from 16384x3
    feats = mk((B, 4096, 128))
    i3 = jax.jit(lambda k: jax.random.randint(k, (B, 16384, 3), 0, 4096,
                                              jnp.int32))(kr)
    w3 = jnp.full((B, 16384, 3), 1 / 3, jnp.float32)
    scan_time('fp0 interp fwd', lambda f: jnp.sum(three_interpolate(f, i3, w3)),
              pX, feats)
    scan_time('fp0 interp bwd (scatter 16384x3 -> 4096)',
              lambda f: gsum(jax.grad(
                  lambda ff: jnp.sum(three_interpolate(ff, i3, w3) ** 2))(f)),
              pX, feats)

    # fp1: 4096x3 -> 1024, 256ch
    f1 = mk((B, 1024, 256))
    i1 = jax.jit(lambda k: jax.random.randint(k, (B, 4096, 3), 0, 1024,
                                              jnp.int32))(kr)
    w1 = jnp.full((B, 4096, 3), 1 / 3, jnp.float32)
    scan_time('fp1 interp bwd (scatter 4096x3 -> 1024, 256ch)',
              lambda f: gsum(jax.grad(
                  lambda ff: jnp.sum(three_interpolate(ff, i1, w1) ** 2))(f)),
              pX, f1)

    # gather_points bwd at sa boundaries (fps gathers)
    g0 = mk((B, 16384, 128))
    gi = jax.jit(lambda k: jax.random.randint(k, (B, 4096), 0, 16384,
                                              jnp.int32))(kr)
    scan_time('gather_points bwd 4096-of-16384, 128ch',
              lambda t: gsum(jax.grad(
                  lambda tt: jnp.sum(gather_points(tt, gi) ** 2))(t)), pX, g0)

    # grouped-MLP + BN backward proxy at sa0 scale-1 (4, 4096, 32, 3->32->64)
    g32 = mk((B, 4096, 32, 3))
    wA, wB, wC = mk((3, 32)), mk((32, 32)), mk((32, 64))

    def mlp(g, wa, wb, wc):
        h = jnp.maximum(g @ wa, 0)
        h = jnp.maximum(h @ wb, 0)
        h = jnp.maximum(h @ wc, 0)
        return jnp.sum(jnp.max(h, axis=2))

    scan_time('sa0 grouped-MLP fwd+bwd (all grads)',
              lambda g, a, b, c: gsum(jax.grad(mlp, argnums=(0, 1, 2, 3))(
                  g, a, b, c)), pX, g32, wA, wB, wC)

    # image tower conv bwd proxy
    img = mk((B, 384, 1280, 3), jnp.bfloat16)
    wc1 = mk((3, 3, 3, 64), jnp.bfloat16)

    def conv(x, w):
        y = jax.lax.conv_general_dilated(
            x, w, (1, 1), 'SAME', dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
        return jnp.sum(jnp.maximum(y, 0).astype(jnp.float32))

    scan_time('img conv1 fwd+bwd',
              lambda x, w: gsum(jax.grad(conv, argnums=(0, 1))(x, w)),
              lambda a, i: (a[0] + jnp.bfloat16(i * 1e-3), a[1]), img, wc1)


if __name__ == '__main__':
    main()
