"""Static-slot Pallas dw kernels vs XLA's conv weight grad, per tower conv.

Run on TPU. First verifies both kernels against jax.grad on small shapes,
then scan-times, for each image-block conv at B4 train shapes: XLA's dw
(grad wrt w only), and the static-slot Pallas kernel
(tools/conv_dw_pallas_attic.py).
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
    print(f'  {name}: {per:.2f} ms', flush=True)
    return per


def main():
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, os.path.join(os.getcwd(), 'tools'))
    from conv_dw_pallas_attic import dw3x3_s1_pallas, dw3x3_s2_pallas

    interp = jax.default_backend() != 'tpu'

    def conv(x, w, stride):
        return jax.lax.conv_general_dilated(
            x, w, (stride, stride), 'SAME',
            dimension_numbers=('NHWC', 'HWIO', 'NHWC'))

    # --- correctness on a small f32 shape ---
    kr = jax.random.PRNGKey(0)
    x = jax.random.normal(kr, (2, 16, 24, 8), jnp.float32)
    for stride, fn, tm in ((1, dw3x3_s1_pallas, 4), (2, dw3x3_s2_pallas, 4)):
        dy = jax.random.normal(jax.random.PRNGKey(1),
                               (2, 16 // stride, 24 // stride, 16),
                               jnp.float32)
        w0 = jnp.zeros((3, 3, 8, 16), jnp.float32)
        ref = jax.grad(lambda w: jnp.sum(conv(x, w, stride) * dy))(w0)
        got = fn(x, dy, tm=tm, interpret=interp)
        err = float(jnp.max(jnp.abs(got - ref)) / (jnp.max(jnp.abs(ref)) + 1e-9))
        print(f'stride-{stride} rel err: {err:.2e}')
        assert err < 1e-4, err
    if interp:
        print('CPU backend: correctness only')
        return

    B = 4
    dt = jnp.bfloat16
    blocks = [('blk0', 384, 1280, 3, 64),
              ('blk1', 192, 640, 64, 128),
              ('blk2', 96, 320, 128, 256),
              ('blk3', 48, 160, 256, 512)]
    pX = lambda a, i: (a[0] + i.astype(dt) * 1e-3,) + tuple(a[1:])

    for label, H, W, Ci, Co in blocks:
        print(f'{label} {H}x{W} {Ci}->{Co}:', flush=True)
        for stride in (1, 2):
            C_in = Ci if stride == 1 else Co
            x = jax.jit(lambda k: jax.random.normal(
                k, (B, H, W, C_in), jnp.float32).astype(dt))(kr)
            dy = jax.jit(lambda k: jax.random.normal(
                k, (B, H // stride, W // stride, Co),
                jnp.float32).astype(dt))(jax.random.PRNGKey(1))
            w0 = jnp.zeros((3, 3, C_in, Co), dt)

            def dw_xla(x, dy, stride=stride, w0=w0):
                g = jax.grad(lambda w: jnp.sum(
                    (conv(x, w, stride) * dy).astype(jnp.float32)))(w0)
                return jnp.sum(g.astype(jnp.float32) ** 2)

            scan_time(f's{stride} dw XLA', dw_xla, pX, x, dy)
            fn = dw3x3_s1_pallas if stride == 1 else dw3x3_s2_pallas
            for tm in (4, 8, 16):
                if (H // stride) % tm:
                    continue
                try:
                    scan_time(f's{stride} dw pallas tm={tm}',
                              lambda x, dy, fn=fn, tm=tm: jnp.sum(
                                  fn(x, dy, tm=tm) ** 2), pX, x, dy)
                except Exception as e:
                    print(f'  s{stride} tm={tm}: FAILED '
                          f'{type(e).__name__}: {str(e)[:200]}', flush=True)


if __name__ == '__main__':
    main()
