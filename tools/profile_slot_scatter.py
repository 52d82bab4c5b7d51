"""Probe the M0 slot-scatter layouts for deconv_sample._bwd (B=4).

Each candidate computes the same mathematical object: 4 per-slot tables
(122880 rows, F=32) accumulating one N=16384-update set each.
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

    B, N, R, F = 4, 16384, 122880, 32
    kr = jax.random.PRNGKey(0)
    cells = jax.jit(lambda k: jax.random.randint(
        k, (B, 4, N), 0, R, jnp.int32))(kr)
    vals = jax.jit(lambda k: jax.random.normal(
        k, (B, 4, N, F), jnp.float32))(kr)

    def plain(ce, va):
        out = 0.0
        for s in range(4):
            t = jax.vmap(lambda c, v: jnp.zeros((R, F), jnp.float32)
                         .at[c].add(v))(ce[:, s], va[:, s])
            out = out + jnp.sum(t)
        return out

    def pad64(ce, va):
        out = 0.0
        for s in range(4):
            v = jnp.concatenate([va[:, s], jnp.zeros_like(va[:, s])], -1)
            t = jax.vmap(lambda c, vv: jnp.zeros((R, 2 * F), jnp.float32)
                         .at[c].add(vv))(ce[:, s], v)
            out = out + jnp.sum(t[..., :F])
        return out

    def dual(ce, va):
        out = 0.0
        for s in range(0, 4, 2):
            z = jnp.zeros_like(va[:, s])
            vA = jnp.concatenate([va[:, s], z], -1)
            vB = jnp.concatenate([z, va[:, s + 1]], -1)
            v = jnp.concatenate([vA, vB], 1)            # (B, 2N, 2F)
            c = jnp.concatenate([ce[:, s], ce[:, s + 1]], 1)
            t = jax.vmap(lambda cc, vv: jnp.zeros((R, 2 * F), jnp.float32)
                         .at[cc].add(vv))(c, v)
            out = out + jnp.sum(t)
        return out

    def quad(ce, va):
        z = jnp.zeros_like(va[:, 0])
        parts = []
        for s in range(4):
            cols = [z] * 4
            cols[s] = va[:, s]
            parts.append(jnp.concatenate(cols, -1))     # (B, N, 4F)
        v = jnp.concatenate(parts, 1)                   # (B, 4N, 4F)
        c = ce.reshape(B, 4 * N)
        t = jax.vmap(lambda cc, vv: jnp.zeros((R, 4 * F), jnp.float32)
                     .at[cc].add(vv))(c, v)
        return jnp.sum(t)

    def plain_bf16(ce, va):
        out = 0.0
        for s in range(4):
            t = jax.vmap(lambda c, v: jnp.zeros((R, F), jnp.bfloat16)
                         .at[c].add(v))(ce[:, s], va[:, s].astype(jnp.bfloat16))
            out = out + jnp.sum(t.astype(jnp.float32))
        return out

    pX = lambda a, i: (a[0], a[1] + i * 1e-5)
    for name, fn in [('plain 4x(N,R,F32)', plain),
                     ('pad64 4x(N,R,F64)', pad64),
                     ('dual  2x(2N,R,2F)', dual),
                     ('quad  1x(4N,R,4F)', quad),
                     ('plain bf16', plain_bf16)]:
        scan_time(name, fn, pX, cells, vals)


if __name__ == '__main__':
    main()
