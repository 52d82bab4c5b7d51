"""Input-gradient cost of the stride-2 3x3 convs: XLA transposed-conv vs
phase-decomposed dx (one 2x2 unstrided conv on the half-res grid -> 4F
phase channels -> depth-to-space interleave).

With SAME/s2/even-H,W (pad_lo=0, pad_hi=1): y[i] = sum_d x[2i+d] K[d], so
dx[2u+p, 2v+q] = sum_{a,b in {0,1}} dy[u-a, v-b] K[p+2a, q+2b]
(entries with p+2a > 2 are zero). That is a 2x2 correlation of dy
(padding lo=1, hi=0) with kernel K'[a', b', c, (p,q,f)] = K[p+2(1-a'),
q+2(1-b'), f, c] zero-extended — 16/9 of the forward FLOPs, no zero
dilation, one conv + one reshuffle.
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

    B = 4
    blocks = [('blk0 384x1280 c64', 384, 1280, 64, 64),
              ('blk1 192x640 c128', 192, 640, 128, 128),
              ('blk2 96x320 c256', 96, 320, 256, 256),
              ('blk3 48x160 c512', 48, 160, 512, 512)]
    dt = jnp.bfloat16
    kr = jax.random.PRNGKey(0)

    def conv_s2(x, w):
        return jax.lax.conv_general_dilated(
            x, w, (2, 2), 'SAME', dimension_numbers=('NHWC', 'HWIO', 'NHWC'))

    def dx_xla(dy, w, xshape):
        x0 = jnp.zeros(xshape, dy.dtype)
        _, pull = jax.vjp(lambda xx: conv_s2(xx, w), x0)
        dx, = pull(dy)
        return jnp.sum(dx.astype(jnp.float32) ** 2)

    def phase_kernel(w):
        # K'[a', b', f, (p, q, c)] from K[d, e, c, f]
        C, F = w.shape[2], w.shape[3]
        kp = jnp.zeros((2, 2, F, 2, 2, C), w.dtype)
        for ap in range(2):
            for bp in range(2):
                for p in range(2):
                    for q in range(2):
                        d = p + 2 * (1 - ap)
                        e = q + 2 * (1 - bp)
                        if d <= 2 and e <= 2:
                            kp = kp.at[ap, bp, :, p, q, :].set(w[d, e].T)
        return kp.reshape(2, 2, F, 4 * C)

    def dx_phase(dy, w, xshape):
        Bq, H2, W2, F = dy.shape
        C = w.shape[2]
        kp = phase_kernel(w)
        out = jax.lax.conv_general_dilated(
            dy, kp, (1, 1), ((1, 0), (1, 0)),
            dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
        out = out.reshape(Bq, H2, W2, 2, 2, C)
        dx = out.transpose(0, 1, 3, 2, 4, 5).reshape(Bq, 2 * H2, 2 * W2, C)
        return jnp.sum(dx.astype(jnp.float32) ** 2)

    def dw_only(x, dy, w):
        def f(ww):
            return conv_s2(x, ww)
        _, pull = jax.vjp(f, w)
        dw, = pull(dy)
        return jnp.sum(dw.astype(jnp.float32) ** 2)

    only = os.environ.get('BLOCKS', '')
    if only:
        keep = {int(s) for s in only.split(',')}
        blocks = [b for i, b in enumerate(blocks) if i in keep]

    for label, H, W, C, F in blocks:
        H2, W2 = H // 2, W // 2
        x = jax.jit(lambda k: jax.random.normal(
            k, (B, H, W, C), jnp.float32).astype(dt))(kr)
        dy = jax.jit(lambda k: jax.random.normal(
            k, (B, H2, W2, F), jnp.float32).astype(dt))(kr)
        w = jax.jit(lambda k: (jax.random.normal(
            k, (3, 3, C, F), jnp.float32) / np.sqrt(9 * C)).astype(dt))(kr)
        pD = lambda a, i: (a[0] + i.astype(dt) * 1e-3,) + tuple(a[1:])

        # numerics check
        got = jax.jit(lambda dy, w: dx_phase(dy, w, x.shape))(dy, w)
        want = jax.jit(lambda dy, w: dx_xla(dy, w, x.shape))(dy, w)
        rel = abs(float(got) - float(want)) / max(abs(float(want)), 1e-9)
        print(f'{label} dx rel-err {rel:.2e}')

        scan_time(f'{label} dx XLA', lambda dy, w: dx_xla(dy, w, x.shape),
                  pD, dy, w)
        scan_time(f'{label} dx phase', lambda dy, w: dx_phase(dy, w, x.shape),
                  pD, dy, w)
        scan_time(f'{label} dw XLA', dw_only, pD, x, dy, w)


if __name__ == '__main__':
    main()
