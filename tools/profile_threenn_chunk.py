"""Scan-timed: approx three_nn unchunked vs query-chunked at fp0 shapes.

The unchunked (8,16384,4096) bf16 field is 1.07 GB of HBM round-trip;
chunking queries lets XLA keep each block's matmul -> approx_min_k fused.
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
                d = (i * 1e-5).astype(args[0].dtype)
                a = (args[0] + d,) + args[1:]
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

    from epnet_tpu.ops.pointops import _chunk_size, _pairwise_d2

    B, N, M = 8, 16384, 4096
    kr = jax.random.PRNGKey(0)
    unk = jax.jit(lambda k: jax.random.uniform(
        k, (B, N, 3), jnp.float32, -35, 35))(kr)
    kn = unk[:, :M]

    def approx_full(u, k_):
        d2 = jnp.clip(_pairwise_d2(u, k_), 0.0, None).astype(jnp.bfloat16)
        vals, idx = lax.approx_min_k(d2, 3, recall_target=0.95)
        return jnp.sum(jnp.sqrt(vals.astype(jnp.float32))) + jnp.sum(idx)

    scan_time('approx three_nn unchunked', approx_full, unk, kn)

    for budget_mb in (64, 16, 8, 4):
        budget = budget_mb * 1024 * 1024

        def approx_chunked(u, k_, budget=budget):
            chunk = _chunk_size(N, budget // (B * M))

            def block(q):
                d2 = jnp.clip(_pairwise_d2(q, k_), 0.0, None).astype(jnp.bfloat16)
                vals, idx = lax.approx_min_k(d2, 3, recall_target=0.95)
                return jnp.sqrt(vals.astype(jnp.float32)), idx.astype(jnp.int32)

            chunks = jnp.moveaxis(u.reshape(B, N // chunk, chunk, 3), 1, 0)
            dist, idx = lax.map(block, chunks)
            return jnp.sum(dist) + jnp.sum(idx)

        scan_time(f'approx three_nn chunked {budget_mb}M-elem', approx_chunked,
                  unk, kn)


if __name__ == '__main__':
    main()
