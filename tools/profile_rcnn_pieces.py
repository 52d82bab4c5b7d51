"""Break the RCNN tower into pieces on the real chip.

The axon remote platform has a ~30 ms dispatch+fetch floor per call, so
each op is timed as K in-graph iterations under lax.scan (inputs perturbed
per step to defeat CSE); reported as (t(K) - t(1)) / (K - 1).
"""
import os
import sys
import time

sys.path.insert(0, os.getcwd())

import numpy as np

K = 21


def scan_time(name, op, perturb, *args):
    """op(*args) -> scalar; perturb(args, i) -> args'. Times K-1 iterations."""
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

        np.asarray(f(args))  # compile+run
        t0 = time.time()
        for _ in range(3):
            np.asarray(f(args))
        return (time.time() - t0) / 3

    t1 = run_k(1)
    tk = run_k(K)
    per = (tk - t1) / (K - 1) * 1000
    print(f'{name}: {per:.2f} ms  (1-iter call {t1 * 1e3:.0f} ms)', flush=True)
    return per


def main():
    import jax
    import jax.numpy as jnp

    from epnet_tpu.ops.pointops import ball_query, furthest_point_sample
    from epnet_tpu.ops.sa_fused import fused_point_mlp_max

    T, N, M, S, C = 800, 512, 128, 64, 128
    kr = jax.random.PRNGKey(0)
    mk = lambda shape, dt=jnp.bfloat16: jax.jit(
        lambda k: jax.random.normal(k, shape, jnp.float32).astype(dt))(kr)
    y = mk((T, N, C))
    o = mk((T, M, C))
    idx = jax.jit(lambda k: jax.random.randint(k, (T, M, S), 0, N, jnp.int32))(kr)
    w2 = mk((C, C))
    b2 = jnp.zeros(C, jnp.float32)

    pY = lambda a, i: (a[0] + i * jnp.bfloat16(1e-3),) + a[1:]

    scan_time('sa0 fused kernel (T800,N512,M128,S64,C128) bf16',
              lambda y, o, idx, w2, b2: jnp.sum(
                  fused_point_mlp_max(y, o, idx, w2, b2, w2, b2).astype(jnp.float32)),
              pY, y, o, idx, w2, b2)

    y1, o1 = y[:, :128], o[:, :32]
    idx1 = jax.jit(lambda k: jax.random.randint(k, (T, 32, 64), 0, 128, jnp.int32))(kr)
    w3b = mk((C, 256))
    b3b = jnp.zeros(256, jnp.float32)
    scan_time('sa1 fused kernel (T800,N128,M32,S64)',
              lambda y, o, idx, w2, b2: jnp.sum(
                  fused_point_mlp_max(y, o, idx, w2, b2, w3b, b3b).astype(jnp.float32)),
              pY, y1, o1, idx1, w2, b2)

    xyz = jax.jit(lambda k: jax.random.uniform(k, (T, N, 3), jnp.float32, -2, 2))(kr)
    pX = lambda a, i: (a[0] + i * 1e-5,) + a[1:]
    scan_time('fps 512->128 x800',
              lambda x: jnp.sum(furthest_point_sample(x, 128).astype(jnp.float32)),
              pX, xyz)
    scan_time('fps 128->32 x800',
              lambda x: jnp.sum(furthest_point_sample(x, 32).astype(jnp.float32)),
              pX, xyz[:, :128])
    scan_time('ball query r.2 s64 (800x128x512)',
              lambda x, c: jnp.sum(ball_query(0.2, S, x, c).astype(jnp.float32)),
              pX, xyz, xyz[:, :M])

    w_up1, w_mg, x5 = mk((5, 128)), mk((256, 128)), mk((T, N, 5))

    def upmerge(x5, rpnf):
        h = jnp.maximum(x5 @ w_up1, 0)
        h = jnp.maximum(h @ w2, 0)
        m = jnp.concatenate([h, rpnf], -1)
        return jnp.sum(jnp.maximum(m @ w_mg, 0).astype(jnp.float32))

    scan_time('xyz_up+merge MLPs (800x512)', upmerge, pY, x5, y)

    tbl, w1 = mk((T, N, 131)), mk((131, 128))
    scan_time('Y = table@W1 (800x512x131->128)',
              lambda t: jnp.sum((t @ w1).astype(jnp.float32)), pY, tbl)

    g, wA, wB, wC = mk((T, 32, 259)), mk((259, 256)), mk((256, 256)), mk((256, 512))

    def tail(g):
        h = jnp.maximum(g @ wA, 0)
        h = jnp.maximum(h @ wB, 0)
        h = jnp.maximum(h @ wC, 0)
        return jnp.sum(jnp.max(h, axis=1).astype(jnp.float32))

    scan_time('sa2 group-all tail', tail, pY, g)


if __name__ == '__main__':
    main()
