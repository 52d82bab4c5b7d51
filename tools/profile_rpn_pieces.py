"""RPN-side op costs at full shapes (B=8) on the real chip, scan-timed."""
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

    from epnet_tpu.ops.pointops import (_pairwise_d2, ball_query_multi,
                                        group_points, three_interpolate,
                                        three_nn)

    B, N = 8, 16384
    kr = jax.random.PRNGKey(0)
    xyz = jax.jit(lambda k: jax.random.uniform(k, (B, N, 3), jnp.float32, -35, 35))(kr)
    pX = lambda a, i: (a[0] + i * 1e-5,) + a[1:]

    cen = xyz[:, :4096]
    scan_time('sa0 ball_query_multi (r .1/.5, s16/32) 4096x16384',
              lambda x, c: sum(jnp.sum(i.astype(jnp.float32))
                               for i in ball_query_multi((0.1, 0.5), (16, 32), x, c)),
              pX, xyz, cen)

    idx16 = jax.jit(lambda k: jax.random.randint(k, (B, 4096, 16), 0, N, jnp.int32))(kr)
    idx32 = jax.jit(lambda k: jax.random.randint(k, (B, 4096, 32), 0, N, jnp.int32))(kr)
    scan_time('sa0 group xyz 4096x(16+32) rows from 16384',
              lambda x, a, b: jnp.sum(group_points(x, a)) + jnp.sum(group_points(x, b)),
              pX, xyz, idx16, idx32)

    # sa1: table (8, 4096, 99ch packed), 1024 centroids x (16+32)
    tbl1 = jax.jit(lambda k: jax.random.normal(k, (B, 4096, 99), jnp.float32))(kr)
    j16 = jax.jit(lambda k: jax.random.randint(k, (B, 1024, 16), 0, 4096, jnp.int32))(kr)
    j32 = jax.jit(lambda k: jax.random.randint(k, (B, 1024, 32), 0, 4096, jnp.int32))(kr)
    scan_time('sa1 group 99ch 1024x48 rows from 4096',
              lambda t, a, b: jnp.sum(group_points(t, a)) + jnp.sum(group_points(t, b)),
              pX, tbl1, j16, j32)
    scan_time('sa1 ball_query_multi 1024x4096',
              lambda x, c: sum(jnp.sum(i.astype(jnp.float32))
                               for i in ball_query_multi((0.5, 1.0), (16, 32),
                                                         x[:, :4096], c)),
              pX, xyz, cen[:, :1024])

    # FP stage 0 (the big one): 3nn of 16384 unknown in 4096 known + interp 128ch
    known = cen
    feats = jax.jit(lambda k: jax.random.normal(k, (B, 4096, 128), jnp.float32))(kr)
    scan_time('fp0 three_nn 16384-in-4096',
              lambda u, kn: jnp.sum(three_nn(u, kn)[0]), pX, xyz, known)

    d3, i3 = three_nn(xyz, known)
    w = jnp.ones_like(d3) / 3
    scan_time('fp0 three_interpolate 16384x3 rows of 128ch',
              lambda f: jnp.sum(three_interpolate(f, i3, w)), pX, feats)

    # SA0 mlp at grouped shapes (2 scales), bf16
    g16 = jax.jit(lambda k: jax.random.normal(k, (B, 4096, 16, 3), jnp.float32).astype(jnp.bfloat16))(kr)
    g32 = jax.jit(lambda k: jax.random.normal(k, (B, 4096, 32, 3), jnp.float32).astype(jnp.bfloat16))(kr)
    w0 = jax.jit(lambda k: jax.random.normal(k, (3, 16), jnp.float32).astype(jnp.bfloat16))(kr)
    w0b = jax.jit(lambda k: jax.random.normal(k, (16, 16), jnp.float32).astype(jnp.bfloat16))(kr)
    w0c = jax.jit(lambda k: jax.random.normal(k, (16, 32), jnp.float32).astype(jnp.bfloat16))(kr)
    w1a = jax.jit(lambda k: jax.random.normal(k, (3, 32), jnp.float32).astype(jnp.bfloat16))(kr)
    w1b = jax.jit(lambda k: jax.random.normal(k, (32, 32), jnp.float32).astype(jnp.bfloat16))(kr)
    w1c = jax.jit(lambda k: jax.random.normal(k, (32, 64), jnp.float32).astype(jnp.bfloat16))(kr)

    def sa0mlp(g16, g32):
        a = jnp.max(jnp.maximum(jnp.maximum(jnp.maximum(g16 @ w0, 0) @ w0b, 0) @ w0c, 0), axis=2)
        b = jnp.max(jnp.maximum(jnp.maximum(jnp.maximum(g32 @ w1a, 0) @ w1b, 0) @ w1c, 0), axis=2)
        return jnp.sum(a.astype(jnp.float32)) + jnp.sum(b.astype(jnp.float32))

    pG = lambda a, i: (a[0] + jnp.bfloat16(i * 1e-3),) + a[1:]
    scan_time('sa0 mlps (no BN, proxy)', sa0mlp, pG, g16, g32)

    # image tower proxy: 4 ImageBlocks bf16
    img = jax.jit(lambda k: jax.random.normal(k, (B, 384, 1280, 3), jnp.float32).astype(jnp.bfloat16))(kr)
    ws = []
    chan = [3, 64, 128, 256, 512]
    for i in range(4):
        ws.append((jax.jit(lambda k, i=i: jax.random.normal(k, (3, 3, chan[i], chan[i + 1]), jnp.float32).astype(jnp.bfloat16) * 0.05)(kr),
                   jax.jit(lambda k, i=i: jax.random.normal(k, (3, 3, chan[i + 1], chan[i + 1]), jnp.float32).astype(jnp.bfloat16) * 0.05)(kr)))

    def tower(x):
        for wa, wb in ws:
            x = jax.lax.conv_general_dilated(x, wa, (1, 1), 'SAME',
                                             dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
            x = jnp.maximum(x, 0)
            x = jax.lax.conv_general_dilated(x, wb, (2, 2), 'SAME',
                                             dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
            x = jnp.maximum(x, 0)
        return jnp.sum(x.astype(jnp.float32))

    scan_time('image tower proxy (4 blocks, bf16, B8)', tower, pG, img)


if __name__ == '__main__':
    main()
