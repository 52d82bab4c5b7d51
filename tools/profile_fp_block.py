"""Isolate the windowed FP interpolation cost at fp0/fp1 shapes (B8)."""
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

    from epnet_tpu.ops.block_local import (_d2_normalized,
                                           block_local_three_interp)
    from epnet_tpu.ops.pointops import three_interpolate, three_nn

    B = 8
    kr = jax.random.PRNGKey(0)
    for tag, N, M, C in [('fp0', 16384, 4096, 128), ('fp1', 4096, 1024, 256)]:
        # morton-ish: sorted along one axis approximates the locality
        u = jax.jit(lambda k, N=N: jnp.sort(jax.random.uniform(
            k, (B, N, 3), jnp.float32, -35, 35), axis=1))(kr)
        kidx = jnp.broadcast_to(
            jnp.arange(0, N, N // M, dtype=jnp.int32)[None], (B, M))
        kx = jnp.take_along_axis(u, kidx[..., None], axis=1)
        f = jax.jit(lambda k, M=M, C=C: jax.random.normal(
            k, (B, M, C), jnp.bfloat16))(kr)

        scan_time(f'{tag} windowed interp (U512 W256)',
                  lambda uu, kk, ff, ki: jnp.sum(block_local_three_interp(
                      uu, kk, ff, ki, 512, 256).astype(jnp.float32)),
                  (u, kx, f, kidx))

        def dense(uu, kk, ff):
            d, i = three_nn(uu, kk)
            r = 1.0 / (d + 1e-8)
            w = (r / jnp.sum(r, -1, keepdims=True)).astype(jnp.bfloat16)
            return jnp.sum(three_interpolate(ff, i, w).astype(jnp.float32))

        scan_time(f'{tag} dense 3nn+interp', dense, (u, kx, f))

        # pieces of the windowed path
        ublock, window = 512, 256
        NBU = N // ublock
        mids = jnp.arange(NBU, dtype=jnp.int32) * ublock + ublock // 2
        centers = jax.vmap(lambda ki: jnp.searchsorted(ki, mids))(kidx)
        starts = jnp.clip(centers.astype(jnp.int32) - window // 2, 0, M - window)

        def d2_and_select(uu, kk, sb):
            def one(ub, kxb, s1):
                wx = jax.vmap(lambda s: lax.dynamic_slice(
                    kxb, (s, 0), (window, 3)))(s1)
                d2 = _d2_normalized(ub.reshape(NBU, ublock, 3), wx,
                                    jnp.float32(1.0))
                acc = 0.0
                d = d2
                for _ in range(3):
                    i = jnp.argmin(d, axis=-1)
                    acc += jnp.sum(i)
                    d = jnp.where(jnp.arange(window) == i[..., None],
                                  jnp.inf, d)
                return acc
            return jnp.sum(jax.vmap(one)(uu, kk, sb).astype(jnp.float32))

        scan_time(f'{tag} d2+3xargmin only', d2_and_select, (u, kx, starts))

        def wmat_mm(uu, ff, sb):
            def one(ub, fb, s1):
                wf = jax.vmap(lambda s: lax.dynamic_slice(
                    fb, (s, 0), (window, ff.shape[-1])))(s1)
                wm = jnp.abs(ub.reshape(NBU, ublock, 3)[..., :1])
                wm = jnp.broadcast_to(wm, (NBU, ublock, window))
                return jnp.sum(jnp.einsum(
                    'nuw,nwc->nuc', wm.astype(jnp.bfloat16), wf,
                    preferred_element_type=jnp.float32))
            return jnp.sum(jax.vmap(one)(uu, ff, sb))

        scan_time(f'{tag} slice+einsum only', wmat_mm, (u, f, starts))


if __name__ == '__main__':
    main()
