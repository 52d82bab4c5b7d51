"""RPN sa0/sa1 interior pieces at bench shapes (B8), block-local paths."""
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

    from __graft_entry__ import _full_batch, _full_config
    from epnet_tpu.models.layers import SharedMLP
    from epnet_tpu.models.pointnet2 import SAModuleMSG
    from epnet_tpu.ops.block_local import block_local_group_nested
    from epnet_tpu.ops.pointops import furthest_point_sample, gather_points

    cfg = _full_config()
    B = 8
    batch = _full_batch(cfg, batch_size=B)
    xyz = jax.device_put(jnp.asarray(batch['pts_input'][..., :3]))
    sa = cfg.RPN.SA_CONFIG

    fps_idx = jnp.sort(furthest_point_sample(xyz, 4096, groups=8), -1)
    cen = gather_points(xyz, fps_idx)

    scan_time('sa0 fps(G8)+sort+gather',
              lambda x: jnp.sum(gather_points(
                  x, jnp.sort(furthest_point_sample(x, 4096, groups=8), -1))),
              (xyz,))

    scan_time('sa0 block_local_group_nested (xyz only)',
              lambda x, c: jnp.sum(block_local_group_nested(
                  sa.RADIUS[0], sa.NSAMPLE[0], x, None, fps_idx, c,
                  window=cfg.RPN.BLOCK_WINDOW, block_c=cfg.RPN.BLOCK_C)[0]),
              (xyz, cen))

    # the two sa0 scale MLPs (BN, eval) on pre-grouped rows
    kr = jax.random.PRNGKey(0)
    g16 = jax.random.normal(kr, (B, 4096, 16, 3), jnp.bfloat16)
    g32 = jax.random.normal(kr, (B, 4096, 32, 3), jnp.bfloat16)

    def mlps(a16, a32):
        m0 = SharedMLP((16, 16, 32), bn=True, dtype=jnp.bfloat16)
        m1 = SharedMLP((32, 32, 64), bn=True, dtype=jnp.bfloat16)
        v0 = m0.init(jax.random.PRNGKey(0), a16, train=False)
        v1 = m1.init(jax.random.PRNGKey(1), a32, train=False)
        o0 = jnp.max(m0.apply(v0, a16, train=False), axis=2)
        o1 = jnp.max(m1.apply(v1, a32, train=False), axis=2)
        return jnp.sum(o0.astype(jnp.float32)) + jnp.sum(o1.astype(jnp.float32))

    scan_time('sa0 two-scale MLP+BN(eval)+max on grouped rows', mlps,
              (g16, g32))

    # full sa0 module (block-local on)
    mod = SAModuleMSG(npoint=4096, radii=sa.RADIUS[0], nsamples=sa.NSAMPLE[0],
                      mlps=sa.MLPS[0], use_xyz=True, bn=True,
                      dtype=jnp.bfloat16, fps_groups=8, block_local=True,
                      block_window=cfg.RPN.BLOCK_WINDOW,
                      block_c=cfg.RPN.BLOCK_C)
    v = jax.jit(mod.init)(jax.random.PRNGKey(0), xyz, None)
    scan_time('sa0 full module',
              lambda x: jnp.sum(mod.apply(v, x, None, train=False)[1]
                                .astype(jnp.float32)), (xyz,))

    # sa1 full module (4096 -> 1024, 96ch features)
    feats1 = jax.random.normal(kr, (B, 4096, 96), jnp.bfloat16)
    mod1 = SAModuleMSG(npoint=1024, radii=sa.RADIUS[1], nsamples=sa.NSAMPLE[1],
                       mlps=sa.MLPS[1], use_xyz=True, bn=True,
                       dtype=jnp.bfloat16, fps_groups=8, block_local=True,
                       block_window=cfg.RPN.BLOCK_WINDOW,
                       block_c=cfg.RPN.BLOCK_C)
    v1 = jax.jit(mod1.init)(jax.random.PRNGKey(0), cen, feats1)
    scan_time('sa1 full module',
              lambda c, f: jnp.sum(mod1.apply(v1, c, f, train=False)[1]
                                   .astype(jnp.float32)), (cen, feats1))

    scan_time('sa1 block_local_group_nested (xyz+96ch)',
              lambda c, f: jnp.sum(block_local_group_nested(
                  sa.RADIUS[1], sa.NSAMPLE[1], c, f,
                  jnp.sort(furthest_point_sample(c, 1024, groups=8), -1),
                  None, window=cfg.RPN.BLOCK_WINDOW,
                  block_c=cfg.RPN.BLOCK_C)[0]), (cen, feats1))


if __name__ == '__main__':
    main()
