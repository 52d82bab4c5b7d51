"""Partitioned-FPS timing at RPN shapes: groups x interleave sweep, on-chip.

Exact FPS is sequential over npoint; partitioned FPS (G interleaved
index-slices, ops/pointops.py:furthest_point_sample) divides the critical
path by G while total per-step work stays constant — IF the Pallas kernel
interleaves all B*G sub-clouds in one grid pass (pair=B*G).
"""
import sys
import os
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

K = 21


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

    from epnet_tpu.ops.fps_pallas import furthest_point_sample_pallas
    from epnet_tpu.ops.pointops import furthest_point_sample

    kr = jax.random.PRNGKey(0)

    # kernel-variant sweep: unrolled-pair vs pair-vectorized at the
    # sub-cloud shapes partitioned FPS produces
    for B, N, npoint, tag in ((8, 16384, 4096, 'G1 sa0'),
                              (64, 2048, 512, 'G8 sa0-sub'),
                              (64, 512, 128, 'G8 sa1-sub')):
        if N % 128:
            continue
        xyz = jax.jit(lambda k: jax.random.uniform(
            k, (B, N, 3), jnp.float32, -40, 40))(kr)
        a = np.asarray(furthest_point_sample_pallas(xyz, npoint, 0, False))
        b = np.asarray(furthest_point_sample_pallas(xyz, npoint, 0, True))
        assert np.array_equal(a, b), f'{tag}: vec != unrolled'
        for pair in (8, 16, 32, 64):
            if B % pair:
                continue
            for vec in (False, True):
                scan_time(
                    f'{tag} B{B} {N}->{npoint} pair={pair} vec={vec}',
                    lambda x, p=pair, v=vec: jnp.sum(
                        furthest_point_sample_pallas(x, npoint, p, v)
                        .astype(jnp.float32)),
                    xyz)

    # dispatch-level timings (vec kernel now default on TPU), incl. the
    # RCNN roi-tower shape where the XLA recurrence used to win
    from epnet_tpu.ops.pointops import furthest_point_sample_xla
    xyz = jax.jit(lambda k: jax.random.uniform(
        k, (800, 512, 3), jnp.float32, -3, 3))(kr)
    scan_time('rcnn 800x512->128 dispatch',
              lambda x: jnp.sum(furthest_point_sample(x, 128)
                                .astype(jnp.float32)), xyz)
    scan_time('rcnn 800x512->128 xla',
              lambda x: jnp.sum(furthest_point_sample_xla(x, 128)
                                .astype(jnp.float32)), xyz)

    for B, N, npoint, tag in ((8, 16384, 4096, 'sa0'), (8, 4096, 1024, 'sa1')):
        xyz = jax.jit(lambda k: jax.random.uniform(
            k, (B, N, 3), jnp.float32, -40, 40))(kr)
        for G in (1, 2, 4, 8, 16):
            if npoint % G or N % G:
                continue
            scan_time(
                f'{tag} B{B} {N}->{npoint} G={G}',
                lambda x, G=G: jnp.sum(
                    furthest_point_sample(x, npoint, groups=G)
                    .astype(jnp.float32)),
                xyz)


if __name__ == '__main__':
    main()
