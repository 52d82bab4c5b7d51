"""One-hot build variants for the fused SA kernel, scan-timed at RCNN sa0
shapes (T800, N512, M128, S64, C 128/128/128).

The shipped kernel builds the one-hot with a 3D iota + (TM,S,N)->(R,N)
reshape; in Mosaic's tiled layout that reshape may be a physical relayout of
the whole tile. Variants: pure-2D compare, f32 arithmetic one-hot.
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

K = 9


def scan_time(name, op, *args):
    import jax
    import jax.numpy as jnp

    def run_k(k):
        @jax.jit
        def f(args):
            def body(acc, i):
                a = (args[0] + i * 1e-5,) + args[1:]
                return acc + op(*a), 0.0
            acc, _ = jax.lax.scan(body, 0.0, jnp.arange(k, dtype=jnp.float32))
            return acc
        np.asarray(f(args))
        t0 = time.time()
        for _ in range(3):
            np.asarray(f(args))
        return (time.time() - t0) / 3

    per = (run_k(K) - run_k(1)) / (K - 1) * 1000
    print(f'{name}: {per:.2f} ms', flush=True)
    return per


def make_variant(oh_mode):
    import jax
    import jax.numpy as jnp
    from jax import lax
    from jax.experimental import pallas as pl

    def kern(y_ref, o_ref, idx_ref, w2_ref, b2_ref, w3_ref, b3_ref,
             out_ref, *, S):
        N = y_ref.shape[1]
        y = y_ref[0]
        idx = idx_ref[0]
        if oh_mode == '2dt':
            R = idx_ref.shape[3]
            TM = R // S
            idx = idx[0]  # (1, R)
        else:
            TM = idx_ref.shape[1]
            R = TM * S
        if oh_mode == '3d':
            iota = lax.broadcasted_iota(jnp.int32, (TM, S, N), 2)
            oh = (idx[:, :, None] == iota).reshape(R, N).astype(jnp.bfloat16)
            g = jnp.dot(oh, y, preferred_element_type=jnp.float32)
        elif oh_mode == '2dt':
            # idx arrives as one (1, R) lane row; the compare broadcasts it
            # down N sublanes — no relayout anywhere. Contract N directly.
            iota = lax.broadcasted_iota(jnp.int32, (N, R), 0)
            oht = (iota == idx).astype(jnp.bfloat16)      # (N, R)
            g = lax.dot_general(oht, y, (((0,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        elif oh_mode == '3d-einsum':
            iota = lax.broadcasted_iota(jnp.int32, (TM, S, N), 2)
            oh3 = (idx[:, :, None] == iota).astype(jnp.bfloat16)
            g = jnp.einsum('tsn,nc->tsc', oh3, y,
                           preferred_element_type=jnp.float32).reshape(R, -1)
        C1 = y.shape[-1]
        o = o_ref[0].astype(jnp.float32)
        ob = jnp.broadcast_to(o[:, None, :], (TM, S, C1)).reshape(R, C1)
        h1 = jnp.maximum(g - ob, 0.0)
        cdt = w2_ref.dtype
        h2 = jnp.maximum(jnp.dot(h1.astype(cdt), w2_ref[:],
                                 preferred_element_type=jnp.float32)
                         + b2_ref[:].astype(jnp.float32), 0.0)
        h3 = jnp.maximum(jnp.dot(h2.astype(cdt), w3_ref[:],
                                 preferred_element_type=jnp.float32)
                         + b3_ref[:].astype(jnp.float32), 0.0)
        C3 = w3_ref.shape[-1]
        out_ref[0] = jnp.max(h3.reshape(TM, S, C3), axis=1).astype(
            out_ref.dtype)

    def run(y, o, idx, w2, b2, w3, b3, TM):
        T, N, C1 = y.shape
        _, M, S = idx.shape
        C2, C3 = w2.shape[-1], w3.shape[-1]
        if oh_mode == '2dt':
            # 4D so the block's trailing dims (1, R) match the array's
            idx = idx.reshape(T, M // TM, 1, TM * S)
            idx_spec = pl.BlockSpec((1, 1, 1, TM * S),
                                    lambda t, j: (t, j, 0, 0))
        else:
            idx_spec = pl.BlockSpec((1, TM, S), lambda t, j: (t, j, 0))
        return pl.pallas_call(
            functools.partial(kern, S=S),
            grid=(T, M // TM),
            in_specs=[
                pl.BlockSpec((1, N, C1), lambda t, j: (t, 0, 0)),
                pl.BlockSpec((1, TM, C1), lambda t, j: (t, j, 0)),
                idx_spec,
                pl.BlockSpec((C1, C2), lambda t, j: (0, 0)),
                pl.BlockSpec((1, C2), lambda t, j: (0, 0)),
                pl.BlockSpec((C2, C3), lambda t, j: (0, 0)),
                pl.BlockSpec((1, C3), lambda t, j: (0, 0)),
            ],
            out_specs=pl.BlockSpec((1, TM, C3), lambda t, j: (t, j, 0)),
            out_shape=jax.ShapeDtypeStruct((T, M, C3), y.dtype),
        )(y, o, idx, w2, b2.reshape(1, C2), w3, b3.reshape(1, C3))

    return run


def main():
    import jax
    import jax.numpy as jnp

    from epnet_tpu.ops.sa_fused import fused_point_mlp_max

    T, N, M, S = 800, 512, 128, 64
    C1 = C2 = C3 = 128
    kr = jax.random.PRNGKey(0)
    ks = jax.random.split(kr, 8)
    y = jax.jit(lambda k: jax.random.normal(
        k, (T, N, C1), jnp.bfloat16))(ks[0])
    o = jax.jit(lambda k: jax.random.normal(
        k, (T, M, C1), jnp.bfloat16))(ks[1])
    idx = jax.jit(lambda k: jax.random.randint(
        k, (T, M, S), 0, N, jnp.int32))(ks[2])
    w2 = jax.jit(lambda k: jax.random.normal(
        k, (C1, C2), jnp.bfloat16))(ks[3])
    b2 = jnp.zeros((C2,), jnp.bfloat16)
    w3 = jax.jit(lambda k: jax.random.normal(
        k, (C2, C3), jnp.bfloat16))(ks[4])
    b3 = jnp.zeros((C3,), jnp.bfloat16)

    scan_time('shipped fused_point_mlp_max',
              lambda yy: jnp.sum(fused_point_mlp_max(
                  yy, o, idx, w2, b2, w3, b3).astype(jnp.float32)), y)

    ref = None
    for mode in ('3d', '2dt', '3d-einsum'):
        run = make_variant(mode)
        for TM in (32, 64):
            got = run(y, o, idx, w2, b2, w3, b3, TM)
            if ref is None:
                ref = np.asarray(got.astype(jnp.float32))
            else:
                np.testing.assert_allclose(
                    np.asarray(got.astype(jnp.float32)), ref, rtol=2e-2,
                    atol=2e-2)
            scan_time(f'{mode} TM={TM}',
                      lambda yy, run=run, TM=TM: jnp.sum(
                          run(yy, o, idx, w2, b2, w3, b3, TM)
                          .astype(jnp.float32)), y)


if __name__ == '__main__':
    main()
