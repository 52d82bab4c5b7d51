"""Nested vs per-scale multi-scale query at RPN shapes, on-chip, scan-timed.

Compares the full grouping front-end (query + xyz/feature gathers) between
the shipped per-scale path (ball_query_multi + 48 gathered rows at sa0) and
the nested nearest-first path (ball_query_nested + 32 rows + prefix select).
Also isolates the HIGHEST- vs default-precision cost of the distance dots.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

K = 11


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
    from jax import lax

    from epnet_tpu.ops.pointops import (ball_query_multi, ball_query_nested,
                                        group_points)

    kr = jax.random.PRNGKey(0)

    for B, N, M, radii, ns, C, tag in (
            (8, 16384, 4096, (0.1, 0.5), (16, 32), 4, 'sa0'),
            (8, 4096, 1024, (0.5, 1.0), (16, 32), 99, 'sa1')):
        xyz = jax.jit(lambda k: jax.random.uniform(
            k, (B, N, 3), jnp.float32, -35, 35))(kr)
        feats = jax.jit(lambda k: jax.random.normal(
            k, (B, N, C), jnp.float32))(kr)
        table = jnp.concatenate([xyz, feats], axis=-1)
        cen = xyz[:, :M]

        def per_scale(x, t, c):
            idxs = ball_query_multi(radii, ns, x, c)
            acc = 0.0
            for i in idxs:
                acc += jnp.sum(group_points(t, i))
            return acc

        def nested(x, t, c):
            idx, cnts = ball_query_nested(radii, ns, x, c)
            g = group_points(t, idx)
            acc = jnp.sum(g)
            for s_i, cnt in zip(ns[:-1], cnts[:-1]):
                sel = (jnp.arange(s_i, dtype=jnp.int32)[None, None, :]
                       < cnt[:, :, None])[..., None]
                acc += jnp.sum(jnp.where(sel, g[:, :, :s_i], g[:, :, 0:1]))
            return acc

        scan_time(f'{tag} per-scale query+gather ({sum(ns)} rows x {3+C}ch)',
                  per_scale, xyz, table, cen)
        scan_time(f'{tag} nested query+gather ({ns[-1]} rows x {3+C}ch)',
                  nested, xyz, table, cen)

    # precision cost of the distance dots alone at the sa0 field shape
    xyz = jax.jit(lambda k: jax.random.uniform(
        k, (8, 16384, 3), jnp.float32, -35, 35))(kr)
    cen = xyz[:, :4096]
    for prec, name in ((lax.Precision.DEFAULT, 'default(bf16)'),
                       (lax.Precision.HIGHEST, 'highest(f32)')):
        scan_time(
            f'd2 field 4096x16384 dots {name}',
            lambda x, c, p=prec: jnp.sum(jnp.einsum(
                '...mc,...nc->...mn', c, x, precision=p)),
            xyz, cen)


if __name__ == '__main__':
    main()
