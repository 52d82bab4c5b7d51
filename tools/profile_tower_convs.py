"""Per-conv joint fwd+grad cost of all 8 image-tower convs at real B4
train shapes: XLA autodiff of the plain lax conv vs ops/conv2d.py's
barriered custom VJP (the shipped path).

Tower layout (ImageBlock = s1 conv Cin->Cout + s2 conv Cout->Cout,
models/fusion.py:22-34; channels config.py IMG_CHANNELS):
  blk0: s1 3->64 @384x1280, s2 64->64 ->192x640
  blk1: s1 64->128 @192x640, s2 128->128 ->96x320
  blk2: s1 128->256 @96x320,  s2 256->256 ->48x160
  blk3: s1 256->512 @48x160,  s2 512->512 ->24x80
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

    from epnet_tpu.ops.conv2d import conv3x3_same

    B = 4
    dt = jnp.bfloat16
    kr = jax.random.PRNGKey(0)

    convs = [('blk0 s1 3->64 @384x1280', 384, 1280, 3, 64, 1),
             ('blk0 s2 64->64 @384x1280', 384, 1280, 64, 64, 2),
             ('blk1 s1 64->128 @192x640', 192, 640, 64, 128, 1),
             ('blk1 s2 128->128 @192x640', 192, 640, 128, 128, 2),
             ('blk2 s1 128->256 @96x320', 96, 320, 128, 256, 1),
             ('blk2 s2 256->256 @96x320', 96, 320, 256, 256, 2),
             ('blk3 s1 256->512 @48x160', 48, 160, 256, 512, 1),
             ('blk3 s2 512->512 @48x160', 48, 160, 512, 512, 2)]

    def lax_conv(x, w, stride):
        return jax.lax.conv_general_dilated(
            x, w, (stride, stride), 'SAME',
            dimension_numbers=('NHWC', 'HWIO', 'NHWC'))

    def gsum(g):
        return sum(jnp.sum(x.astype(jnp.float32) ** 2)
                   for x in jax.tree_util.tree_leaves(g))

    pX = lambda a, i: (a[0] + i.astype(a[0].dtype) * 1e-3,) + tuple(a[1:])

    # round-2 shipped s2 backward: XLA dx + 4-shift einsum dw (no barrier)
    def einsum_bwd_loss(x, w):
        y = lax_conv(x, w, 2)
        dy = 2.0 * jax.lax.stop_gradient(y)
        _, pull = jax.vjp(lambda xx: lax_conv(xx, w, 2), x)
        dx, = pull(dy)
        B_, H_, W_, C_ = x.shape
        H2_, W2_ = H_ // 2, W_ // 2
        xs = x.reshape(B_, H2_, 2, W2_, 2, C_).transpose(0, 1, 3, 2, 4, 5)
        xs = xs.reshape(B_, H2_, W2_, 4 * C_)
        xs = jnp.pad(xs, ((0, 0), (0, 1), (0, 1), (0, 0)))
        acc = gsum((dx,))
        for a in range(2):
            for b in range(2):
                win = jax.lax.dynamic_slice(
                    xs, (0, a, b, 0), (B_, H2_, W2_, 4 * C_))
                acc = acc + gsum((jnp.einsum(
                    'bhwk,bhwf->kf', win, dy,
                    preferred_element_type=jnp.float32),))
        return acc

    tot_lax = tot_new = 0.0
    for label, H, W, C, F, s in convs:
        x = jax.jit(lambda k: jax.random.normal(
            k, (B, H, W, C), jnp.float32).astype(dt))(kr)
        w = jax.jit(lambda k: (jax.random.normal(
            k, (3, 3, C, F), jnp.float32) / np.sqrt(9 * C)).astype(dt))(kr)

        def loss_lax(x, w, s=s):
            return jnp.sum(lax_conv(x, w, s).astype(jnp.float32) ** 2)

        def loss_new(x, w, s=s):
            return jnp.sum(conv3x3_same(x, w, s).astype(jnp.float32) ** 2)

        tot_lax += scan_time(f'{label} lax joint', lambda *a: gsum(
            jax.grad(loss_lax, argnums=(0, 1))(*a)), pX, x, w)
        tot_new += scan_time(f'{label} new joint', lambda *a: gsum(
            jax.grad(loss_new, argnums=(0, 1))(*a)), pX, x, w)
        if s == 2:
            scan_time(f'{label} r2-einsum joint', einsum_bwd_loss, pX, x, w)

    print(f'TOTAL lax {tot_lax:.1f} ms   new {tot_new:.1f} ms', flush=True)


if __name__ == '__main__':
    main()
