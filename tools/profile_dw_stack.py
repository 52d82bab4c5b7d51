"""Profile weight-grad variants for every image-tower conv (B4 train shapes).

Compares, per conv: XLA's autodiff dw vs the stacked-shift Pallas kernels
(tools/conv_dw_pallas_attic.py dw3x3_s1_stack / dw3x3_s2_stack) that do all 9
kernel slots in one (3C, 3F) / (4C, 4F) MXU dot per row tile. Also
differential-checks each Pallas result against the f32 XLA oracle.

Timing: k-pair differencing inside one jitted lax.scan (k = 2 vs 12),
min over 4 repeats — the remote platform needs a host fetch to fence.
"""
import os
import sys
import time

sys.path.insert(0, os.getcwd())

import numpy as np

K0, K1, REPS = 2, 12, 4


def scan_time(name, op, *args):
    import jax
    import jax.numpy as jnp

    def run_k(k):
        @jax.jit
        def f(args):
            def body(acc, i):
                a = [x + i * 1e-6 for x in args]
                r = op(*a)
                return acc + jnp.sum(r.astype(jnp.float32)), 0.0
            acc, _ = jax.lax.scan(body, jnp.float32(0.0),
                                  jnp.arange(k, dtype=jnp.float32))
            return acc

        np.asarray(f(args))  # compile
        best = 1e9
        for _ in range(REPS):
            t0 = time.time()
            np.asarray(f(args))
            best = min(best, time.time() - t0)
        return best

    t0, t1 = run_k(K0), run_k(K1)
    per = (t1 - t0) / (K1 - K0) * 1000
    print(f'  {name}: {per:.2f} ms', flush=True)
    return per


def main():
    import jax
    import jax.numpy as jnp
    sys.path.insert(0, os.path.join(os.getcwd(), 'tools'))
    from conv_dw_pallas_attic import (dw3x3_s1_stack, dw3x3_s2_stack,
                                              pick_s1_params, pick_s2_params)

    B = int(os.environ.get('B', '4'))
    dt = jnp.bfloat16 if os.environ.get('DT', 'bf16') == 'bf16' else jnp.float32
    kr = jax.random.PRNGKey(0)

    convs = [
        ('blk0 s1 384x1280 3->64', 1, 384, 1280, 3, 64),
        ('blk0 s2 384x1280 64->64', 2, 384, 1280, 64, 64),
        ('blk1 s1 192x640 64->128', 1, 192, 640, 64, 128),
        ('blk1 s2 192x640 128->128', 2, 192, 640, 128, 128),
        ('blk2 s1 96x320 128->256', 1, 96, 320, 128, 256),
        ('blk2 s2 96x320 256->256', 2, 96, 320, 256, 256),
        ('blk3 s1 48x160 256->512', 1, 48, 160, 256, 512),
        ('blk3 s2 48x160 512->512', 2, 48, 160, 512, 512),
    ]

    def conv(x, w, s):
        return jax.lax.conv_general_dilated(
            x, w, (s, s), 'SAME', dimension_numbers=('NHWC', 'HWIO', 'NHWC'))

    tot_xla = tot_best = 0.0
    for label, s, H, W, Ci, Co in convs:
        print(label, flush=True)
        k1, k2 = jax.random.split(jax.random.fold_in(kr, hash(label) % 1000))
        x = jax.jit(lambda k: jax.random.normal(k, (B, H, W, Ci), jnp.float32).astype(dt))(k1)
        dy = jax.jit(lambda k: jax.random.normal(
            k, (B, H // s, W // s, Co), jnp.float32).astype(dt))(k2)

        def xla_dw(x, dy, _s=s, _Ci=Ci, _Co=Co):
            def f(w):
                return jnp.sum(conv(x, w, _s) * dy)
            return jax.grad(f)(jnp.zeros((3, 3, _Ci, _Co), x.dtype))

        t_xla = scan_time('xla dw', xla_dw, x, dy)
        tot_xla += t_xla
        t_best = t_xla

        params = (pick_s1_params if s == 1 else pick_s2_params)(
            H, W, Ci, Co, np.dtype(dt).itemsize)
        if Ci >= 16 and params is not None:
            tm, fc = params
            fn = dw3x3_s1_stack if s == 1 else dw3x3_s2_stack
            try:
                want = xla_dw(x.astype(jnp.float32), dy.astype(jnp.float32))
                got = fn(x, dy, tm=tm, f_chunk=fc)
                err = float(jnp.max(jnp.abs(got - want))
                            / jnp.max(jnp.abs(want)))
                t_p = scan_time(f'pallas stack tm{tm} fc{fc} (rel {err:.1e})',
                                lambda a, b: fn(a, b, tm=tm, f_chunk=fc), x, dy)
                t_best = min(t_best, t_p)
            except Exception as e:
                print(f'  pallas FAILED: {type(e).__name__}: {str(e)[:160]}')
        else:
            print(f'  pallas skipped (params={params}, Ci={Ci})')
        tot_best += t_best

    print(f'totals: xla {tot_xla:.2f} ms, best-of {tot_best:.2f} ms', flush=True)


if __name__ == '__main__':
    main()
