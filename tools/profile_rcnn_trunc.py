"""Cumulative truncation bisect of RCNNNet at eval shapes (800 rois)."""
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
                a = (args[0] + (i * 1e-5).astype(args[0].dtype),) + args[1:]
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

    from __graft_entry__ import _full_config
    from epnet_tpu.models.layers import PointwiseConv, SharedMLP, kaiming_normal
    from epnet_tpu.models.pointnet2 import SAModuleMSG

    cfg = _full_config()
    rc = cfg.RCNN
    T, S = 800, 512
    kr = jax.random.PRNGKey(0)
    ks = jax.random.split(kr, 4)
    # canonical-frame-ish pooled input, sorted along x (order from the
    # Morton-sorted cloud)
    x = jnp.sort(jax.random.uniform(ks[0], (T, S), jnp.float32, -2.5, 2.5), 1)
    geom = jnp.stack([x,
                      jax.random.uniform(ks[1], (T, S), jnp.float32, -1, 1),
                      jax.random.uniform(ks[2], (T, S), jnp.float32, -1, 1),
                      jax.random.uniform(ks[3], (T, S), jnp.float32, 0, 1),
                      jax.random.uniform(ks[0], (T, S), jnp.float32, -.5, .5)],
                     -1)
    rpnf = jax.random.normal(ks[1], (T, S, 128), jnp.bfloat16)
    pts_input = jnp.concatenate([geom.astype(jnp.bfloat16), rpnf], -1)

    class Trunc(nn.Module):
        n_sa: int
        heads: bool = False

        @nn.compact
        def __call__(self, p):
            dt = jnp.bfloat16
            ci = rc.input_channel
            xyz = p[..., 0:3].astype(jnp.float32)
            xyz_feat = SharedMLP(rc.XYZ_UP_LAYER, bn=rc.USE_BN, dtype=dt,
                                 name='xyz_up')(p[..., 0:ci], train=False)
            merged = jnp.concatenate([xyz_feat, p[..., ci:]], axis=-1)
            feats = SharedMLP((rc.XYZ_UP_LAYER[-1],), bn=rc.USE_BN, dtype=dt,
                              name='merge_down')(merged, train=False)
            l_xyz, l_feats = xyz, feats
            for i in range(self.n_sa):
                np_i = rc.SA_CONFIG.NPOINTS[i]
                l_xyz, l_feats, _ = SAModuleMSG(
                    npoint=None if np_i == -1 else np_i,
                    radii=(rc.SA_CONFIG.RADIUS[i],),
                    nsamples=(rc.SA_CONFIG.NSAMPLE[i],),
                    mlps=(rc.SA_CONFIG.MLPS[i],),
                    use_xyz=True, bn=rc.USE_BN, dtype=dt,
                    block_local=rc.BLOCK_LOCAL,
                    block_window=rc.BLOCK_WINDOW, block_c=rc.BLOCK_C,
                    name=f'sa{i}')(l_xyz, l_feats, train=False)
            if not self.heads:
                return jnp.sum(l_feats.astype(jnp.float32))
            h = l_feats[:, 0, :].astype(jnp.float32)
            acc = 0.0
            for branch in ('cls', 'reg', 'iou'):
                hh = h
                for k, f in enumerate((512, 512)):
                    hh = PointwiseConv(f, bn=rc.USE_BN,
                                       name=f'{branch}{k}')(hh, train=False)
                acc += jnp.sum(nn.Dense(8, name=f'{branch}o')(hh))
            return acc

    for n_sa, heads in [(0, False), (1, False), (2, False), (3, False),
                        (3, True)]:
        m = Trunc(n_sa=n_sa, heads=heads)
        v = jax.jit(m.init)(jax.random.PRNGKey(0), pts_input)
        scan_time(f'cum sa<{n_sa} heads={heads}',
                  lambda p, m=m, v=v: m.apply(v, p), (pts_input,))


if __name__ == '__main__':
    main()
