"""Windowed vs dense fused SA kernel + query costs at RCNN tower shapes."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

K = 11


def scan_time(name, op, args):
    import jax
    import jax.numpy as jnp

    def run_k(k):
        @jax.jit
        def f(args):
            def body(acc, i):
                a = (args[0] + (i * 1e-5).astype(args[0].dtype),) + args[1:]
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


def main():
    import jax
    import jax.numpy as jnp

    from epnet_tpu.ops.block_local import block_local_window_query
    from epnet_tpu.ops.pointops import ball_query
    from epnet_tpu.ops.sa_fused import (fused_point_mlp_max,
                                        fused_point_mlp_max_win)

    T, N, M, S, C = 800, 512, 128, 64, 128
    kr = jax.random.PRNGKey(0)
    ks = jax.random.split(kr, 4)
    x = jnp.sort(jax.random.uniform(ks[0], (T, N), jnp.float32, -2, 2), 1)
    xyz = jnp.stack([x,
                     jax.random.uniform(ks[1], (T, N), jnp.float32, -1, 1),
                     jax.random.uniform(ks[2], (T, N), jnp.float32, -1, 1)],
                    -1)
    pidx = jnp.broadcast_to(jnp.sort(jax.random.choice(
        ks[3], N, (M,), replace=False)), (T, M))
    cen = jnp.take_along_axis(xyz, pidx[..., None], 1)

    y = jax.random.normal(ks[0], (T, N, C), jnp.bfloat16)
    o = jax.random.normal(ks[1], (T, M, C), jnp.bfloat16) * 0.1
    w2 = jax.random.normal(ks[2], (C, C), jnp.bfloat16) * 0.05
    b2 = jnp.zeros((C,), jnp.float32)
    w3 = jax.random.normal(ks[3], (C, C), jnp.bfloat16) * 0.05
    b3 = jnp.zeros((C,), jnp.float32)

    gidx = jax.random.randint(ks[0], (T, M, S), 0, N, jnp.int32)
    scan_time('dense fused kernel (N=512 one-hot)',
              lambda yy, oo: jnp.sum(fused_point_mlp_max(
                  yy, oo, gidx, w2, b2, w3, b3).astype(jnp.float32)), (y, o))

    for W, BC in [(256, 32), (256, 64), (128, 32)]:
        NB = M // BC
        widx = jax.random.randint(ks[1], (T, M, S), 0, W, jnp.int32)
        st = (jax.random.randint(ks[2], (T, NB), 0, (N - W) // 8 + 1,
                                 jnp.int32) * 8)
        scan_time(f'windowed fused kernel W={W} bc={BC}',
                  lambda yy, oo, W=W, widx=widx, st=st:
                  jnp.sum(fused_point_mlp_max_win(
                      yy, oo, widx, st, w2, b2, w3, b3, W)
                      .astype(jnp.float32)), (y, o))

    scan_time('dense query (ball_query 512)',
              lambda xx, cc: jnp.sum(ball_query(0.2, S, xx, cc)), (xyz, cen))
    for W, BC in [(256, 32), (256, 64)]:
        scan_time(f'windowed query W={W} bc={BC}',
                  lambda xx, cc, W=W, BC=BC: jnp.sum(block_local_window_query(
                      0.2, S, xx, pidx, cc, window=W, block_c=BC)[0]),
                  (xyz, cen))


if __name__ == '__main__':
    main()


def query_pieces():
    import jax
    import jax.numpy as jnp
    from jax import lax

    T, N, M, S = 800, 512, 128, 64
    W, BC = 256, 32
    NB = M // BC
    kr = jax.random.PRNGKey(0)
    ks = jax.random.split(kr, 4)
    x = jnp.sort(jax.random.uniform(ks[0], (T, N), jnp.float32, -2, 2), 1)
    xyz = jnp.stack([x,
                     jax.random.uniform(ks[1], (T, N), jnp.float32, -1, 1),
                     jax.random.uniform(ks[2], (T, N), jnp.float32, -1, 1)],
                    -1)
    pidx = jnp.broadcast_to(jnp.sort(jax.random.choice(
        ks[3], N, (M,), replace=False)), (T, M))
    cen = jnp.take_along_axis(xyz, pidx[..., None], 1)
    starts = (jax.random.randint(ks[2], (T, NB), 0, (N - W) // 8 + 1,
                                 jnp.int32) * 8)

    def slices_d2(xx, cc, sb):
        def one(xb, cb, s1):
            wx = jax.vmap(lambda s: lax.dynamic_slice(xb, (s, 0), (W, 3)))(s1)
            diff = cb.reshape(NB, BC, 1, 3) - wx[:, None, :, :]
            return jnp.sum(diff * diff)
        return jnp.sum(jax.vmap(one)(xx, cc, sb))

    scan_time('winq: slices+d2 only', slices_d2, (xyz, cen, starts))

    def with_amk(xx, cc, sb):
        def one(xb, cb, s1):
            wx = jax.vmap(lambda s: lax.dynamic_slice(xb, (s, 0), (W, 3)))(s1)
            diff = cb.reshape(NB, BC, 1, 3) - wx[:, None, :, :]
            d2 = jnp.sum(diff * diff, -1)
            keys = jnp.where(d2 < 1.0, (-d2).astype(jnp.bfloat16),
                             jnp.asarray(-4.0, jnp.bfloat16))
            v, loc = lax.approx_max_k(keys, S, recall_target=0.95)
            return jnp.sum(loc) + jnp.sum(v.astype(jnp.float32))
        return jnp.sum(jax.vmap(one)(xx, cc, sb))

    scan_time('winq: +approx_max_k', with_amk, (xyz, cen, starts))

    def with_topk(xx, cc, sb):
        def one(xb, cb, s1):
            wx = jax.vmap(lambda s: lax.dynamic_slice(xb, (s, 0), (W, 3)))(s1)
            diff = cb.reshape(NB, BC, 1, 3) - wx[:, None, :, :]
            d2 = jnp.sum(diff * diff, -1)
            keys = jnp.where(d2 < 1.0, (-d2).astype(jnp.bfloat16),
                             jnp.asarray(-4.0, jnp.bfloat16))
            v, loc = lax.top_k(keys, S)
            return jnp.sum(loc) + jnp.sum(v.astype(jnp.float32))
        return jnp.sum(jax.vmap(one)(xx, cc, sb))

    scan_time('winq: +top_k exact', with_topk, (xyz, cen, starts))

    # flat layout: collapse (T, NB) into one batched dim before the select
    def with_amk_flat(xx, cc, sb):
        def one(xb, s1):
            return jax.vmap(lambda s: lax.dynamic_slice(xb, (s, 0), (W, 3)))(s1)
        wx = jax.vmap(one)(xx, sb).reshape(T * NB, W, 3)
        cb = cc.reshape(T * NB, BC, 3)
        diff = cb[:, :, None, :] - wx[:, None, :, :]
        d2 = jnp.sum(diff * diff, -1)
        keys = jnp.where(d2 < 1.0, (-d2).astype(jnp.bfloat16),
                         jnp.asarray(-4.0, jnp.bfloat16))
        v, loc = lax.approx_max_k(keys, S, recall_target=0.95)
        return jnp.sum(loc) + jnp.sum(v.astype(jnp.float32))

    scan_time('winq: flat +approx_max_k', with_amk_flat, (xyz, cen, starts))


if 'pieces' in sys.argv:
    query_pieces()
