"""Microbenchmark: block-local grouping primitive vs the shipped sa0 path.

Premise (tools/profile_gather_locality.py): XLA row gathers run ~7 ns/row
regardless of index locality, so sa0's 1M gathered rows cost ~7-13 ms/B8.
Block-local grouping replaces them with (a) a vmapped dynamic_slice window
extraction (few contiguous copies) + (b) an in-window one-hot MXU gather +
(c) a small in-window top_k ball select. This measures each piece at sa0
shapes (B8, N=16384, M=4096, S=32, window=1024, 32 centroid blocks).
"""
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
    from jax import lax

    from epnet_tpu.ops.pointops import _pairwise_d2, group_points

    rng = np.random.RandomState(0)
    B, N, M, S = 8, 16384, 4096, 32
    W = 1024           # candidate window per centroid block
    CB = 128           # centroids per block
    NB = M // CB       # 32 blocks
    C = 4              # xyz + intensity

    kr = jax.random.PRNGKey(0)
    table = jax.jit(lambda k: jax.random.normal(k, (B, N, C), jnp.float32))(kr)
    xyz = table[..., :3]
    # sorted parent positions: monotone like sorted fps indices
    parents = np.sort(np.stack([rng.choice(N, M, replace=False)
                                for _ in range(B)]), axis=-1).astype(np.int32)
    starts = np.clip(parents.reshape(B, NB, CB)[:, :, CB // 2] - W // 2,
                     0, N - W).astype(np.int32)
    dstarts = jnp.asarray(starts)
    dparents = jnp.asarray(parents)

    # (a) window extraction: B x NB contiguous (W, C) slices
    def extract(t, st):
        def one(tb, sb):  # (N, C), (NB,)
            return jax.vmap(lambda s: lax.dynamic_slice(tb, (s, 0), (W, C)))(sb)
        return jnp.sum(jax.vmap(one)(t, st))

    scan_time(f'window extract {NB}x({W},{C})', lambda t: extract(t, dstarts),
              table)

    # (b) ball-select within window: d2 (CB, W) -> top_k S
    cen = jnp.take_along_axis(xyz, dparents[..., None], axis=1)  # (B, M, 3)

    def select(t, st):
        def one(tb, cb, sb):
            win = jax.vmap(lambda s: lax.dynamic_slice(tb, (s, 0), (W, 3)))(sb)
            cc = cb.reshape(NB, CB, 3)
            d2 = _pairwise_d2(cc, win)          # (NB, CB, W)
            keys = jnp.where(d2 < 0.25, (-d2).astype(jnp.bfloat16),
                             jnp.asarray(-4.0, jnp.bfloat16))
            v, idx = lax.top_k(keys, S)
            return jnp.sum(idx) + jnp.sum(v.astype(jnp.float32))
        return sum(jax.vmap(one)(t[..., :3], cen, st))

    scan_time('window d2+top_k select', lambda t: select(t, dstarts), xyz)

    # (c) in-window one-hot gather of S rows per centroid
    idx_local = jnp.asarray(rng.randint(0, W, (B, NB, CB, S), np.int32))

    def gather(t, st, il):
        def one(tb, sb, ib):
            win = jax.vmap(lambda s: lax.dynamic_slice(tb, (s, 0), (W, C)))(sb)
            # (NB, CB*S, W) one-hot @ (NB, W, C)
            oh = jax.nn.one_hot(ib.reshape(NB, CB * S), W, dtype=tb.dtype)
            out = jnp.einsum('nkw,nwc->nkc', oh, win,
                             preferred_element_type=jnp.float32,
                             precision=lax.Precision.HIGHEST)
            return jnp.sum(out)
        return jnp.sum(jax.vmap(one)(t, st, il))

    scan_time('window one-hot gather S32', lambda t: gather(t, dstarts, idx_local),
              table)

    # combined: extract once, select + gather fused
    def make_full(W_, CB_, approx, st_np):
        NB_ = M // CB_
        st = jnp.asarray(st_np)

        def full(t):
            def one(tb, cb, sb):
                win = jax.vmap(
                    lambda s: lax.dynamic_slice(tb, (s, 0), (W_, C)))(sb)
                cc = cb.reshape(NB_, CB_, 3)
                d2 = _pairwise_d2(cc, win[..., :3])
                keys = jnp.where(d2 < 0.25, (-d2).astype(jnp.bfloat16),
                                 jnp.asarray(-4.0, jnp.bfloat16))
                if approx:
                    v, idx = lax.approx_max_k(keys, S, recall_target=0.95)
                else:
                    v, idx = lax.top_k(keys, S)
                oh = jax.nn.one_hot(idx.reshape(NB_, CB_ * S), W_,
                                    dtype=tb.dtype)
                out = jnp.einsum('nkw,nwc->nkc', oh, win,
                                 preferred_element_type=jnp.float32,
                                 precision=lax.Precision.DEFAULT)
                return jnp.sum(out) + jnp.sum(v.astype(jnp.float32))
            return jnp.sum(jax.vmap(one)(t, cen, st))
        return full

    for W_, CB_ in ((1024, 128), (512, 64), (512, 128), (256, 64)):
        NB_ = M // CB_
        st_np = np.clip(parents.reshape(B, NB_, CB_)[:, :, CB_ // 2] - W_ // 2,
                        0, N - W_).astype(np.int32)
        for approx in (False, True):
            scan_time(
                f'FULL block-local W{W_} CB{CB_} '
                f'{"approx" if approx else "top_k"}',
                make_full(W_, CB_, approx, st_np), table)

    # current path for comparison: nested query + packed row gather
    from epnet_tpu.ops.pointops import ball_query_nested

    def current(t):
        nidx, cnts = ball_query_nested((0.1, 0.5), (16, 32), t[..., :3], cen)
        g = group_points(t, nidx)
        return jnp.sum(g)

    scan_time('CURRENT nested query + row gather', current, table)


if __name__ == '__main__':
    main()
