"""A/B the replacement s2 forwards (tools/conv_fwd_attic.py: Pallas
row-tile kernel + space-to-depth 2x2-conv reformulation) against XLA's
strided-conv forward at the 4 tower s2 shapes (B4, bf16).

VERDICT (run on the real chip 2026-08-20, this file): XLA wins everywhere.
  blk0 64->64 @384x1280: lax 5.04 ms, s2d 6.18, pallas: scoped-VMEM OOM
  blk1 128->128 @192x640: lax 1.34 ms, s2d 3.22, pallas: OOM
  blk2 256->256 @96x320:  lax 0.31 ms, s2d 0.85, pallas: OOM
The round-3 "blk0 4.9 vs 0.7 roofline" gap is real but neither
reformulation closes it: the Pallas kernel's phase-split intermediates
tile to 79 MB scoped VMEM (16 MB limit) and the s2d transpose costs more
than the strided inefficiency it removes. Shipped forward = plain lax
(epnet_tpu/ops/conv2d.py:_conv_fwd).
"""
import os
import sys
import time

sys.path.insert(0, os.getcwd())
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

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
    from jax import lax

    from conv_fwd_attic import (conv3x3_s2_fwd_pallas,
                                               conv3x3_s2_fwd_s2d,
                                               pick_fwd_s2_tm)

    B = 4
    dt = jnp.bfloat16
    kr = jax.random.PRNGKey(0)

    convs = [('blk0 s2 64->64 @384x1280', 384, 1280, 64, 64),
             ('blk1 s2 128->128 @192x640', 192, 640, 128, 128),
             ('blk2 s2 256->256 @96x320', 96, 320, 256, 256),
             ('blk3 s2 512->512 @48x160', 48, 160, 512, 512)]

    def conv(x, w):
        return lax.conv_general_dilated(
            x, w, (2, 2), 'SAME', dimension_numbers=('NHWC', 'HWIO', 'NHWC'))

    pX = lambda a, i: (a[0] + i.astype(a[0].dtype) * 1e-3,) + tuple(a[1:])
    for label, H, W, C, F in convs:
        tm = pick_fwd_s2_tm(H, W, C, F)
        x = jax.jit(lambda k: jax.random.normal(
            k, (B, H, W, C), jnp.float32).astype(dt))(kr)
        w = jax.jit(lambda k: (jax.random.normal(
            k, (3, 3, C, F), jnp.float32) / np.sqrt(9 * C)).astype(dt))(kr)

        # numerics first (cheap, on-device)
        ya = np.asarray(jax.jit(conv)(x, w), np.float32)
        yc = np.asarray(jax.jit(conv3x3_s2_fwd_s2d)(x, w), np.float32)
        rel = np.abs(ya - yc).max() / (np.abs(ya).max() + 1e-9)
        print(f'{label}: s2d max rel err {rel:.2e}', flush=True)
        pallas_ok = tm is not None
        if pallas_ok:
            try:
                yb = np.asarray(jax.jit(conv3x3_s2_fwd_pallas)(x, w),
                                np.float32)
                rel = np.abs(ya - yb).max() / (np.abs(ya).max() + 1e-9)
                print(f'{label}: pallas tm={tm} max rel err {rel:.2e}',
                      flush=True)
            except Exception as e:  # e.g. scoped-VMEM OOM at compile
                pallas_ok = False
                print(f'{label}: pallas tm={tm} FAILED: '
                      f'{str(e).splitlines()[0][:120]}', flush=True)
        else:
            print(f'{label}: no tm fits VMEM — Pallas unavailable', flush=True)

        scan_time(f'{label} fwd [lax]',
                  lambda x, w: jnp.sum(conv(x, w).astype(jnp.float32)),
                  pX, x, w)
        scan_time(f'{label} fwd [s2d]',
                  lambda x, w: jnp.sum(
                      conv3x3_s2_fwd_s2d(x, w).astype(jnp.float32)),
                  pX, x, w)
        if pallas_ok:
            scan_time(
                f'{label} fwd [pallas]',
                lambda x, w: jnp.sum(
                    conv3x3_s2_fwd_pallas(x, w).astype(jnp.float32)),
                pX, x, w)


if __name__ == '__main__':
    main()
