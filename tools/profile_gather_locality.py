"""Does index locality change XLA row-gather throughput on TPU?

Shapes = roipool packed gather (B8, 100x512 rows of 133 f32 ch from 16384)
and RPN sa0 grouping (B8, 4096x32 rows of 7 ch). Index patterns: uniform
random, per-roi ascending-sorted random, contiguous blocks.
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


def main():
    import jax
    import jax.numpy as jnp

    rng = np.random.RandomState(0)
    B, N = 8, 16384

    for C, R, tag in ((133, 100 * 512, 'roipool 51200rows'),
                      (7, 4096 * 32, 'sa0 131072rows')):
        kr = jax.random.PRNGKey(0)
        table = jax.jit(lambda k: jax.random.normal(
            k, (B, N, C), jnp.float32))(kr)

        rnd = rng.randint(0, N, (B, R)).astype(np.int32)
        srt = np.sort(rnd.reshape(B, -1, 512) if R % 512 == 0 else rnd[:, None],
                      axis=-1).reshape(B, R)
        base = rng.randint(0, N - 512, (B, R // 512)).astype(np.int32)
        blocks = (base[..., None] + np.arange(512, dtype=np.int32)
                  ).reshape(B, R)

        for name, idx in (('random', rnd), ('sorted/512', srt),
                          ('contig/512', blocks)):
            di = jnp.asarray(idx)
            scan_time(f'{tag} C{C} {name}',
                      lambda t, i=di: jnp.sum(
                          jnp.take_along_axis(t, i[..., None], axis=1)),
                      table)


if __name__ == '__main__':
    main()
