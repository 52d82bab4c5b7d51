"""Scan-timed cumulative bisect of the RPN point stream at bench shapes.

Runs the point-only encoder/decoder truncated after each SA / FP stage with
the REAL speed-mode knobs (bf16, FPS_GROUPS, BLOCK_LOCAL) so stage costs are
attributed under exactly the shipped configuration; per-stage cost =
difference of consecutive cumulative times.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

K = 9


def scan_time(name, op, args):
    import jax
    import jax.numpy as jnp

    def run_k(k):
        @jax.jit
        def f(args):
            def body(acc, i):
                v, b = args
                return acc + op(v, b + i * 1e-5), 0.0
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

    from __graft_entry__ import _full_batch, _full_config
    from epnet_tpu.models.pointnet2 import (FPModule, SAModuleMSG,
                                            sa_uses_block_local)

    cfg = _full_config()
    B = 8
    batch = _full_batch(cfg, batch_size=B)
    pts = jax.device_put(jnp.asarray(batch['pts_input']))
    sa = cfg.RPN.SA_CONFIG
    dt = jnp.bfloat16 if cfg.MIXED_PRECISION else None

    class Trunc(nn.Module):
        n_sa: int
        n_fp: int = 0

        @nn.compact
        def __call__(self, p):
            xyz, feats = p[..., 0:3], None
            l_xyz, l_feats = [xyz], [feats]
            l_idx, sorted_ok = [None], [bool(cfg.RPN.BLOCK_LOCAL)]
            for i in range(self.n_sa):
                nxyz, nfeats, fps_idx = SAModuleMSG(
                    npoint=sa.NPOINTS[i], radii=sa.RADIUS[i],
                    nsamples=sa.NSAMPLE[i], mlps=sa.MLPS[i],
                    use_xyz=True, bn=cfg.RPN.USE_BN, dtype=dt,
                    sampler=cfg.RPN.SAMPLING, fps_groups=cfg.RPN.FPS_GROUPS,
                    block_local=cfg.RPN.BLOCK_LOCAL,
                    block_window=cfg.RPN.BLOCK_WINDOW,
                    block_c=cfg.RPN.BLOCK_C, name=f'sa{i}')(
                        l_xyz[i], l_feats[i], train=False)
                l_xyz.append(nxyz)
                l_feats.append(nfeats)
                l_idx.append(fps_idx)
                sorted_ok.append(sorted_ok[i] and sa_uses_block_local(
                    cfg.RPN.BLOCK_LOCAL, sa.NPOINTS[i], sa.RADIUS[i],
                    sa.NSAMPLE[i], l_xyz[i].shape[1], cfg.RPN.BLOCK_WINDOW,
                    cfg.RPN.BLOCK_C))
            if self.n_fp:
                n_tot = len(cfg.RPN.FP_MLPS)
                fps = [FPModule(mlp=cfg.RPN.FP_MLPS[k], bn=cfg.RPN.USE_BN,
                                dtype=dt, block_local=cfg.RPN.BLOCK_LOCAL,
                                name=f'fp{k}') for k in range(n_tot)]
                # FP runs deepest-first: fp with index -1 first
                for i in range(-1, -(self.n_fp + 1), -1):
                    l_feats[i - 1] = fps[i](l_xyz[i - 1], l_xyz[i],
                                            l_feats[i - 1], l_feats[i],
                                            train=False,
                                            known_idx=(l_idx[i]
                                                       if sorted_ok[i]
                                                       else None))
                return jnp.sum(l_feats[-self.n_fp - 1].astype(jnp.float32))
            return jnp.sum(l_feats[-1].astype(jnp.float32))

    results = []
    plans = [(k, 0) for k in range(1, 5)] + [(4, k) for k in range(1, 5)]
    for n_sa, n_fp in plans:
        m = Trunc(n_sa=n_sa, n_fp=n_fp)
        v = jax.jit(lambda r, b, m=m: m.init(r, b))(jax.random.PRNGKey(0), pts)
        t = scan_time(f'cum sa<{n_sa} fp<{n_fp}',
                      lambda vv, bb, m=m: m.apply(vv, bb), (v, pts))
        results.append(((n_sa, n_fp), t))
    prev = 0.0
    print('--- per-stage deltas ---')
    names = ['sa0', 'sa1', 'sa2', 'sa3', 'fp3', 'fp2', 'fp1', 'fp0']
    for name, (_, t) in zip(names, results):
        print(f'{name}: {t - prev:+.2f} ms')
        prev = t


if __name__ == '__main__':
    main()
