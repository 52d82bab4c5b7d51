"""Scaling law of a single vmapped row scatter-add on the TPU:
cost(U updates, R table rows, C row width), B=4 batch dim.

Decides the grid-sample-backward redesign (tools/profile_gs_bwd.py found
chunking/sorting don't help and cost is strongly non-linear).
"""
import os
import sys
import time

sys.path.insert(0, os.getcwd())

import numpy as np

K = 11


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
    kr = jax.random.PRNGKey(0)
    cases = []
    for U in (16384, 65536, 262144):
        for R in (30720, 122880, 491520):
            for C in (32, 64):
                cases.append((U, R, C))

    for U, R, C in cases:
        idx = jax.jit(lambda k: jax.random.randint(
            k, (B, U), 0, R, jnp.int32))(kr)
        val = jax.jit(lambda k: jax.random.normal(
            k, (B, U, C), jnp.float32))(kr)

        def op(ix, v):
            df = jax.vmap(lambda fl, vv: jnp.zeros((R, C), jnp.float32)
                          .at[fl].add(vv))(ix, v)
            return jnp.sum(df)

        scan_time(f'U={U:6d} R={R:6d} C={C}', op,
                  lambda a, i: (a[0], a[1] + i * 1e-5), idx, val)


if __name__ == '__main__':
    main()
