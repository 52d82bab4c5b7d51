"""Scan-timed per-stage op costs of the RPN interior at bench shapes (B8).

Covers what profile_eval_scan.py's coarse bisect leaves unattributed:
sa1-sa3 query+gather+MLP, FP-stage 3nn/interp/MLP, image blocks, deconv
pyramid, grid_sample fusion gathers.
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
                d = (i * 1e-5).astype(args[0].dtype)
                a = (args[0] + d,) + args[1:]
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
    from flax import linen as nn

    from epnet_tpu.models.layers import SharedMLP
    from epnet_tpu.ops.pointops import (ball_query_nested, group_points,
                                        three_interpolate, three_nn)

    B = 8
    kr = jax.random.PRNGKey(0)

    # (N, M, radii, ns, C_in, mlps) per RPN SA stage (config defaults)
    stages = [
        ('sa1', 4096, 1024, (0.5, 1.0), (16, 32), 96 + 3,
         ((64, 64, 128), (64, 96, 128))),
        ('sa2', 1024, 256, (1.0, 2.0), (16, 32), 256 + 3,
         ((128, 196, 256), (128, 196, 256))),
        ('sa3', 256, 64, (2.0, 4.0), (16, 32), 512 + 3,
         ((256, 256, 512), (256, 384, 512))),
    ]
    for tag, N, M, radii, ns, C, mlps in stages:
        xyz = jax.jit(lambda k, N=N: jax.random.uniform(
            k, (B, N, 3), jnp.float32, -35, 35))(kr)
        feats = jax.jit(lambda k, N=N, C=C: jax.random.normal(
            k, (B, N, C - 3), jnp.bfloat16))(kr)
        cen = xyz[:, :M]

        def query(x, c):
            idx, cnts = ball_query_nested(radii, ns, x, c)
            return jnp.sum(idx) + sum(jnp.sum(c_) for c_ in cnts)

        scan_time(f'{tag} nested query', query, xyz, cen)

        idx = jax.jit(lambda k, N=N, M=M: jax.random.randint(
            k, (B, M, ns[-1]), 0, N, jnp.int32))(kr)

        def gath(x, f, i):
            t = jnp.concatenate([x, f.astype(x.dtype)], -1)
            return jnp.sum(group_points(t, i))

        scan_time(f'{tag} table gather ({ns[-1]} rows x {C}ch)', gath,
                  xyz, feats, idx)

        g = jax.jit(lambda k, M=M, C=C: jax.random.normal(
            k, (B, M, ns[-1], C), jnp.bfloat16))(kr)

        def mlp(gg):
            acc = 0.0
            for j, hidden in enumerate(mlps):
                m = SharedMLP(hidden, bn=True, dtype=jnp.bfloat16)
                p = m.init(jax.random.PRNGKey(j), gg, train=False)
                h = m.apply(p, gg, train=False)
                acc += jnp.sum(jnp.max(h, axis=2).astype(jnp.float32))
            return acc

        scan_time(f'{tag} 2-scale MLP+max', mlp, g)

    # FP stages: three_nn + interpolate + MLP at (unknown_N, known_M)
    fps = [('fp0', 16384, 4096, 257, (128, 128)),
           ('fp1', 4096, 1024, 608, (256, 256)),
           ('fp2', 1024, 256, 1024, (512, 512)),
           ('fp3', 256, 64, 1536, (512, 512))]
    for tag, N, M, C, hidden in fps:
        unk = jax.jit(lambda k, N=N: jax.random.uniform(
            k, (B, N, 3), jnp.float32, -35, 35))(kr)
        kn = unk[:, :M]
        feats = jax.jit(lambda k, M=M, C=C: jax.random.normal(
            k, (B, M, C // 2), jnp.float32))(kr)

        scan_time(f'{tag} three_nn {N}x{M}', lambda u, k_: jnp.sum(
            three_nn(u, k_)[0]), unk, kn)

        d = jax.jit(lambda k, N=N: jax.random.uniform(
            k, (B, N, 3), jnp.float32, 0.1, 2.0))(kr)
        i3 = jax.jit(lambda k, N=N, M=M: jax.random.randint(
            k, (B, N, 3), 0, M, jnp.int32))(kr)
        scan_time(f'{tag} interpolate {N} rows x {C // 2}ch',
                  lambda dd, f, ii: jnp.sum(three_interpolate(f, ii, 1.0 / dd)),
                  d, feats, i3)

        h = jax.jit(lambda k, N=N, C=C: jax.random.normal(
            k, (B, N, C), jnp.bfloat16))(kr)

        def fpmlp(hh, hidden=hidden):
            m = SharedMLP(hidden, bn=True, dtype=jnp.bfloat16)
            p = m.init(jax.random.PRNGKey(0), hh, train=False)
            return jnp.sum(m.apply(p, hh, train=False).astype(jnp.float32))

        scan_time(f'{tag} MLP {N}x{C}->{hidden[-1]}', fpmlp, h)

    # image stream pieces
    img = jax.jit(lambda k: jax.random.normal(
        k, (B, 384, 1280, 3), jnp.float32))(kr)

    class Blocks(nn.Module):
        @nn.compact
        def __call__(self, x):
            outs = []
            c = 64
            x = x.astype(jnp.bfloat16)
            for i in range(4):
                x = nn.Conv(c, (3, 3), dtype=jnp.bfloat16)(x)
                x = nn.relu(x)
                x = nn.Conv(c, (3, 3), strides=(2, 2), dtype=jnp.bfloat16)(x)
                x = nn.relu(x)
                outs.append(x)
                c *= 2
            return outs

    bl = Blocks()
    bp = jax.jit(lambda: bl.init(jax.random.PRNGKey(0), img))()
    scan_time('image blocks (4 stages)', lambda im: sum(
        jnp.sum(o.astype(jnp.float32)) for o in bl.apply(bp, im)), img)

    from epnet_tpu.models.fusion import DeConvUp, DeconvFusionHead
    from epnet_tpu.models.layers import kaiming_normal

    class DeConvOld(nn.Module):
        """The unfused tail: 4x DeConvUp -> concat -> 1x1 reduce."""

        @nn.compact
        def __call__(self, feats):
            outs = [DeConvUp(16, 2 ** (i + 1), dtype=jnp.bfloat16)(f)
                    for i, f in enumerate(feats)]
            cat = jnp.concatenate(outs, -1)
            return nn.Dense(32, use_bias=False, kernel_init=kaiming_normal(),
                            dtype=jnp.bfloat16)(cat)

    fmaps = [jax.jit(lambda k, i=i: jax.random.normal(
        k, (B, 384 // 2 ** (i + 1), 1280 // 2 ** (i + 1), 64 * 2 ** i),
        jnp.bfloat16))(kr) for i in range(4)]
    dc = DeConvOld()
    dp = jax.jit(lambda: dc.init(jax.random.PRNGKey(0), fmaps))()
    scan_time('deconv pyramid unfused (4x dts + concat + 1x1)',
              lambda f0: jnp.sum(
                  dc.apply(dp, [f0] + fmaps[1:]).astype(jnp.float32)),
              fmaps[0])

    fh = DeconvFusionHead(reduce=(16,) * 4, kernels=(2, 4, 8, 16),
                          features=32, dtype=jnp.bfloat16)
    fp = jax.jit(lambda: fh.init(jax.random.PRNGKey(0), fmaps))()
    scan_time('deconv pyramid fused (DeconvFusionHead)', lambda f0: jnp.sum(
        fh.apply(fp, [f0] + fmaps[1:]).astype(jnp.float32)), fmaps[0])

    # grid-sample fusion gathers at the 4 stages + final
    from epnet_tpu.ops.grid_sample import grid_sample_points
    for i, (Np, Ci) in enumerate([(4096, 64), (1024, 128), (256, 256),
                                  (64, 512), (16384, 32)]):
        Hs = 384 // 2 ** min(i + 1, 4) if i < 4 else 384
        Ws = 1280 // 2 ** min(i + 1, 4) if i < 4 else 1280
        fm = jax.jit(lambda k, H=Hs, W=Ws, C=Ci: jax.random.normal(
            k, (B, H, W, C), jnp.bfloat16))(kr)
        xy = jax.jit(lambda k, Np=Np: jax.random.uniform(
            k, (B, Np, 2), jnp.float32, -1, 1))(kr)
        scan_time(f'grid_sample stage{i} {Np}pts x {Ci}ch',
                  lambda f, x: jnp.sum(grid_sample_points(f, x)
                                       .astype(jnp.float32)), fm, xy)


if __name__ == '__main__':
    main()
