"""Folded-gather probe: TPU row gathers are row-issue-bound, nearly flat in
width; gathering idx//F rows of F*C channels then selecting the idx%F
sub-row on the VPU trades rows (expensive) for width (cheap).

Correctness + timing at the sa0 grouping and roipool shapes.
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


def folded_gather(table, idx, F):
    """table (B, N, C), idx (B, R) -> (B, R, C) via idx//F row gather."""
    import jax.numpy as jnp

    B, N, C = table.shape
    folded = table.reshape(B, N // F, F * C)
    g = jnp.take_along_axis(folded, (idx // F)[..., None], axis=1)
    g = g.reshape(*idx.shape, F, C)
    # arithmetic sub-row select (NOT take_along_axis — that is itself a
    # row gather and costs more than the saved rows)
    sub = idx % F
    oh = (sub[..., None] == jnp.arange(F, dtype=jnp.int32)).astype(g.dtype)
    return jnp.einsum('...fc,...f->...c', g, oh)


def main():
    import jax
    import jax.numpy as jnp

    rng = np.random.RandomState(0)
    B, N = 8, 16384

    for C, R, tag in ((7, 4096 * 32, 'sa0'), (133, 100 * 512, 'roipool')):
        kr = jax.random.PRNGKey(0)
        table = jax.jit(lambda k: jax.random.normal(
            k, (B, N, C), jnp.float32))(kr)
        idx = jnp.asarray(rng.randint(0, N, (B, R)).astype(np.int32))

        want = np.asarray(jnp.take_along_axis(table, idx[..., None], axis=1))
        for F in (2, 4, 8):
            got = np.asarray(folded_gather(table, idx, F))
            assert np.array_equal(got, want), f'{tag} F={F} mismatch'

        scan_time(f'{tag} C{C} plain',
                  lambda t, i=idx: jnp.sum(
                      jnp.take_along_axis(t, i[..., None], axis=1)), table)
        for F in (2, 4, 8, 16):
            if N % F:
                continue
            scan_time(f'{tag} C{C} folded F={F}',
                      lambda t, i=idx, F=F: jnp.sum(folded_gather(t, i, F)),
                      table)


if __name__ == '__main__':
    main()
