"""sa0 ball-query variants at RPN shapes (8x4096x16384), scan-timed."""
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
    from jax import lax

    from epnet_tpu.ops.pointops import _pairwise_d2

    B, N, M = 8, 16384, 4096
    RADII, NS = (0.1, 0.5), (16, 32)
    kr = jax.random.PRNGKey(0)
    xyz = jax.jit(lambda k: jax.random.uniform(k, (B, N, 3), jnp.float32, -35, 35))(kr)
    cen = xyz[:, :M]
    pX = lambda a, i: (a[0] + i * 1e-5,) + a[1:]

    def shared_f32(x, c):
        d2 = _pairwise_d2(c, x)
        tot = 0.0
        for r, s in zip(RADII, NS):
            keys = jnp.where(d2 < r * r, -jnp.arange(N, dtype=jnp.float32), -2.0 * N)
            v, i = lax.approx_max_k(keys, s, recall_target=0.95)
            tot += jnp.sum(i.astype(jnp.float32))
        return tot

    scan_time('shared d2, f32 keys (current)', shared_f32, pX, xyz, cen)

    def shared_bf16(x, c):
        d2 = _pairwise_d2(c, x)
        iota = -jnp.arange(N, dtype=jnp.float32).astype(jnp.bfloat16)
        tot = 0.0
        for r, s in zip(RADII, NS):
            keys = jnp.where(d2 < r * r, iota, jnp.bfloat16(-2.0 * N))
            v, i = lax.approx_max_k(keys, s, recall_target=0.95)
            tot += jnp.sum(i.astype(jnp.float32))
        return tot

    scan_time('shared d2, bf16 keys', shared_bf16, pX, xyz, cen)

    def unshared_bf16(x, c):
        iota = -jnp.arange(N, dtype=jnp.float32).astype(jnp.bfloat16)
        tot = 0.0
        for r, s in zip(RADII, NS):
            d2 = _pairwise_d2(c, x)
            keys = jnp.where(d2 < r * r, iota, jnp.bfloat16(-2.0 * N))
            v, i = lax.approx_max_k(keys, s, recall_target=0.95)
            tot += jnp.sum(i.astype(jnp.float32))
        return tot

    scan_time('unshared d2, bf16 keys', unshared_bf16, pX, xyz, cen)

    def unshared_bf16_d2bf16(x, c):
        iota = -jnp.arange(N, dtype=jnp.float32).astype(jnp.bfloat16)
        xb, cb = x.astype(jnp.bfloat16), c.astype(jnp.bfloat16)
        tot = 0.0
        for r, s in zip(RADII, NS):
            aa = jnp.sum(cb * cb, axis=-1)[..., :, None]
            bb = jnp.sum(xb * xb, axis=-1)[..., None, :]
            ab = jnp.einsum('bmc,bnc->bmn', cb, xb,
                            preferred_element_type=jnp.float32)
            d2 = (aa + bb).astype(jnp.float32) - 2.0 * ab
            keys = jnp.where(d2 < r * r, iota, jnp.bfloat16(-2.0 * N))
            v, i = lax.approx_max_k(keys, s, recall_target=0.95)
            tot += jnp.sum(i.astype(jnp.float32))
        return tot

    scan_time('unshared bf16 d2 + bf16 keys', unshared_bf16_d2bf16, pX, xyz, cen)

    # chunked over M: does blocking the field into cache-sized strips help?
    def chunked_bf16(x, c):
        iota = -jnp.arange(N, dtype=jnp.float32).astype(jnp.bfloat16)
        CH = 512
        tot = 0.0
        for r, s in zip(RADII, NS):
            def blk(cen_blk):
                d2 = _pairwise_d2(cen_blk, x)
                keys = jnp.where(d2 < r * r, iota, jnp.bfloat16(-2.0 * N))
                v, i = lax.approx_max_k(keys, s, recall_target=0.95)
                return i
            chunks = jnp.moveaxis(c.reshape(B, M // CH, CH, 3), 1, 0)
            i = lax.map(blk, chunks)
            tot += jnp.sum(i.astype(jnp.float32))
        return tot

    scan_time('chunked(512) unshared, bf16 keys', chunked_bf16, pX, xyz, cen)

    # the shipped implementation: per-scale 1/r-prescaled dots (CSE-proof)
    # fused into bf16 key fields
    from epnet_tpu.ops.pointops import ball_query_multi

    def shipped(x, c):
        idxs = ball_query_multi(RADII, NS, x, c, exact=False)
        return sum(jnp.sum(i.astype(jnp.float32)) for i in idxs)

    scan_time('shipped ball_query_multi', shipped, pX, xyz, cen)


if __name__ == '__main__':
    main()
