"""FPS variants at RCNN roi shapes + fused-kernel tile sweep, on-chip."""
import os
import sys
import time

sys.path.insert(0, os.getcwd())

import numpy as np

K = 21


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

    from epnet_tpu.ops.fps_pallas import furthest_point_sample_pallas
    from epnet_tpu.ops.pointops import furthest_point_sample_xla
    from epnet_tpu.ops.sa_fused import _fused_fwd_impl

    kr = jax.random.PRNGKey(0)
    xyz = jax.jit(lambda k: jax.random.uniform(k, (800, 512, 3), jnp.float32, -2, 2))(kr)
    pX = lambda a, i: (a[0] + i * 1e-5,) + a[1:]

    scan_time('fps XLA 512->128 x800',
              lambda x: jnp.sum(furthest_point_sample_xla(x, 128).astype(jnp.float32)),
              pX, xyz)
    scan_time('fps XLA 128->32 x800',
              lambda x: jnp.sum(furthest_point_sample_xla(x[:, :128], 32).astype(jnp.float32)),
              pX, xyz)
    scan_time('fps pallas 512->128 x800',
              lambda x: jnp.sum(furthest_point_sample_pallas(x, 128).astype(jnp.float32)),
              pX, xyz)

    # RPN shape sanity: pallas must stay the winner at (8, 16384) -> 4096
    big = jax.jit(lambda k: jax.random.uniform(k, (8, 16384, 3), jnp.float32, -40, 40))(kr)
    scan_time('fps pallas 16384->4096 x8',
              lambda x: jnp.sum(furthest_point_sample_pallas(x, 4096).astype(jnp.float32)),
              pX, big, )
    scan_time('fps XLA 16384->4096 x8',
              lambda x: jnp.sum(furthest_point_sample_xla(x, 4096).astype(jnp.float32)),
              pX, big)
    for pr in (2, 4, 8):
        scan_time(f'fps pallas 16384->4096 x8 pair={pr}',
                  lambda x, _p=pr: jnp.sum(
                      furthest_point_sample_pallas(x, 4096, _p)
                      .astype(jnp.float32)),
                  pX, big)

    # fused kernel tile sweep
    T, N, M, S, C = 800, 512, 128, 64, 128
    mk = lambda shape: jax.jit(
        lambda k: jax.random.normal(k, shape, jnp.float32).astype(jnp.bfloat16))(kr)
    y, o, w2 = mk((T, N, C)), mk((T, M, C)), mk((C, C))
    idx = jax.jit(lambda k: jax.random.randint(k, (T, M, S), 0, N, jnp.int32))(kr)
    b2 = jnp.zeros(C, jnp.float32)
    pY = lambda a, i: (a[0] + i * jnp.bfloat16(1e-3),) + a[1:]
    for tm in (16, 32, 64):
        try:
            scan_time(f'sa0 fused TM={tm}',
                      lambda y, o, idx: jnp.sum(
                          _fused_fwd_impl(y, o, idx, w2, b2, w2, b2, tm, None,
                                          None).astype(jnp.float32)),
                      pY, y, o, idx)
        except Exception as e:
            print(f'sa0 fused TM={tm}: FAILED {type(e).__name__}', flush=True)


if __name__ == '__main__' and '--i16' not in __import__('sys').argv:
    main()


def i16_onehot_probe():
    """Does a 16-bit compare speed the fused kernel's one-hot build?"""
    import functools
    import time

    import jax
    import jax.numpy as jnp
    from jax import lax
    from jax.experimental import pallas as pl

    import numpy as np

    T, N, M, S, C = 800, 512, 128, 64, 128
    kr = jax.random.PRNGKey(0)
    mk = lambda shape: jax.jit(
        lambda k: jax.random.normal(k, shape, jnp.float32).astype(jnp.bfloat16))(kr)
    y, o, w2 = mk((T, N, C)), mk((T, M, C)), mk((C, C))
    idx = jax.jit(lambda k: jax.random.randint(k, (T, M, S), 0, N, jnp.int32))(kr)
    b2 = jnp.zeros(C, jnp.float32)

    def kernel(y_ref, o_ref, idx_ref, w2_ref, b2_ref, out_ref, *, S, idt):
        TM = idx_ref.shape[1]
        Nn = y_ref.shape[1]
        R = TM * S
        yk = y_ref[0]
        idxk = idx_ref[0].astype(idt)
        iota = lax.broadcasted_iota(idt, (TM, S, Nn), 2)
        oh = (idxk[:, :, None] == iota).reshape(R, Nn)
        g = jnp.dot(oh.astype(jnp.bfloat16), yk,
                    preferred_element_type=jnp.float32)
        ob = jnp.broadcast_to(o_ref[0].astype(jnp.float32)[:, None, :],
                              (TM, S, yk.shape[-1])).reshape(R, yk.shape[-1])
        h1 = jnp.maximum(g - ob, 0.0)
        h2 = jnp.maximum(jnp.dot(h1.astype(jnp.bfloat16), w2_ref[:],
                                 preferred_element_type=jnp.float32)
                         + b2_ref[:].astype(jnp.float32), 0.0)
        h3 = jnp.maximum(jnp.dot(h2.astype(jnp.bfloat16), w2_ref[:],
                                 preferred_element_type=jnp.float32)
                         + b2_ref[:].astype(jnp.float32), 0.0)
        C3 = w2_ref.shape[-1]
        out_ref[0] = jnp.max(h3.reshape(TM, S, C3), axis=1).astype(out_ref.dtype)

    def run(idt, label):
        import functools as ft
        TM = 64
        f = pl.pallas_call(
            ft.partial(kernel, S=S, idt=idt),
            grid=(T, M // TM),
            in_specs=[
                pl.BlockSpec((1, N, C), lambda t, j: (t, 0, 0)),
                pl.BlockSpec((1, TM, C), lambda t, j: (t, j, 0)),
                pl.BlockSpec((1, TM, S), lambda t, j: (t, j, 0)),
                pl.BlockSpec((C, C), lambda t, j: (0, 0)),
                pl.BlockSpec((1, C), lambda t, j: (0, 0)),
            ],
            out_specs=pl.BlockSpec((1, TM, C), lambda t, j: (t, j, 0)),
            out_shape=jax.ShapeDtypeStruct((T, M, C), jnp.bfloat16),
        )

        def op(y, o, idx):
            return jnp.sum(f(y, o, idx, w2, b2.reshape(1, C)).astype(jnp.float32))

        K = 11

        def run_k(k):
            @jax.jit
            def g(args):
                def body(acc, i):
                    a = (args[0] + i * jnp.bfloat16(1e-3),) + args[1:]
                    return acc + op(*a), 0.0
                acc, _ = jax.lax.scan(body, 0.0, jnp.arange(k, dtype=jnp.float32))
                return acc
            np.asarray(g((y, o, idx)))
            t0 = time.time()
            for _ in range(3):
                np.asarray(g((y, o, idx)))
            return (time.time() - t0) / 3

        t1, tk = run_k(1), run_k(K)
        print(f'{label}: {(tk - t1) / (K - 1) * 1000:.2f} ms', flush=True)

    for idt, label in ((jnp.int32, 'onehot compare int32'),
                       (jnp.int16, 'onehot compare int16'),
                       (jnp.uint16, 'onehot compare uint16')):
        try:
            run(idt, label)
        except Exception as e:
            print(f'{label}: FAILED {type(e).__name__}: {str(e)[:120]}',
                  flush=True)


if __name__ == '__main__' and '--i16' in __import__('sys').argv:
    i16_onehot_probe()
