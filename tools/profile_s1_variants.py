"""Stride-1 tower conv backward variants (round-4 attack on the s1 joint
lowering pathology, VERDICT r3 next-round item 1b).

Round-3 facts (tools/profile_tower_convs.py, B4 bf16): the s1 convs' lax
joint fwd+grad totals 11.0 ms across the 4 tower shapes, the barriered
custom VJP that fixes s2 HURTS s1 (20.9 total; blk0's 3->64 conv
3.6 -> 12.0), and isolated given-dy pulls are 1-3 ms. Hypotheses bisected
here, per s1 shape:

  lax      — plain lax autodiff joint (shipped, baseline)
  barrier  — barriered cotangent + jax.vjp pulls (the s2 fix; known bad)
  bar_dx   — barriered dy for the dx pull only; dw pulls unbarriered dy
  bar_dw   — barriered dy for the dw pull only; dx pulls unbarriered dy
  convdx   — barriered dy; dx as an EXPLICIT forward conv of dy with the
             spatially-flipped, io-transposed kernel (s1 SAME identity:
             dx = conv_s1(dy, rot180(w)^T)) + vjp dw
  convdx_nb— same explicit dx/vjp dw but NO barrier
  remat    — jax.checkpoint around the plain conv (recompute-in-bwd
             restructures the joint cluster)
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
    import functools

    import jax
    import jax.numpy as jnp
    from jax import lax

    B = 4
    dt = jnp.bfloat16
    kr = jax.random.PRNGKey(0)

    convs = [('blk0 s1 3->64 @384x1280', 384, 1280, 3, 64),
             ('blk1 s1 64->128 @192x640', 192, 640, 64, 128),
             ('blk2 s1 128->256 @96x320', 96, 320, 128, 256),
             ('blk3 s1 256->512 @48x160', 48, 160, 256, 512)]

    def conv(x, w):
        return lax.conv_general_dilated(
            x, w, (1, 1), 'SAME', dimension_numbers=('NHWC', 'HWIO', 'NHWC'))

    def gsum(*gs):
        return sum(jnp.sum(g.astype(jnp.float32) ** 2) for g in gs)

    def make_variant(kind):
        @functools.partial(jax.custom_vjp)
        def cv(x, w):
            return conv(x, w)

        def fwd(x, w):
            return conv(x, w), (x, w)

        def bwd(res, dy):
            x, w = res
            dyb = lax.optimization_barrier(dy)
            if kind == 'barrier':
                _, pull = jax.vjp(conv, x, w)
                return pull(dyb)
            if kind == 'bar_dx':
                _, px = jax.vjp(lambda xx: conv(xx, w), x)
                _, pw = jax.vjp(lambda ww: conv(x, ww), w)
                return px(dyb)[0], pw(dy)[0]
            if kind == 'bar_dw':
                _, px = jax.vjp(lambda xx: conv(xx, w), x)
                _, pw = jax.vjp(lambda ww: conv(x, ww), w)
                return px(dy)[0], pw(dyb)[0]
            if kind in ('convdx', 'convdx_nb'):
                d = dyb if kind == 'convdx' else dy
                wr = w[::-1, ::-1].transpose(0, 1, 3, 2)  # rot180, swap io
                dx = conv(d, wr)
                _, pw = jax.vjp(lambda ww: conv(x, ww), w)
                return dx, pw(d)[0]
            raise ValueError(kind)

        cv.defvjp(fwd, bwd)
        return cv

    pX = lambda a, i: (a[0] + i.astype(a[0].dtype) * 1e-3,) + tuple(a[1:])
    only = sys.argv[1:] or None
    totals = {}
    for label, H, W, C, F in convs:
        x = jax.jit(lambda k: jax.random.normal(
            k, (B, H, W, C), jnp.float32).astype(dt))(kr)
        w = jax.jit(lambda k: (jax.random.normal(
            k, (3, 3, C, F), jnp.float32) / np.sqrt(9 * C)).astype(dt))(kr)

        def joint(f):
            def op(x, w):
                g = jax.grad(
                    lambda xx, ww: jnp.sum(
                        f(xx, ww).astype(jnp.float32) ** 2),
                    argnums=(0, 1))(x, w)
                return gsum(*g)
            return op

        variants = {'lax': joint(conv),
                    'remat': joint(jax.checkpoint(conv))}
        for kind in ('barrier', 'bar_dx', 'bar_dw', 'convdx', 'convdx_nb'):
            variants[kind] = joint(make_variant(kind))

        for kind, op in variants.items():
            if only and kind not in only:
                continue
            per = scan_time(f'{label} [{kind}]', op, pX, x, w)
            totals[kind] = totals.get(kind, 0.0) + per

    for kind, tot in totals.items():
        print(f'TOTAL [{kind}]: {tot:.1f} ms', flush=True)


if __name__ == '__main__':
    main()
