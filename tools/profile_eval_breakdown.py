"""Stage breakdown of the eval path at bench shapes (B=8) on the real chip,
plus micro-benchmarks of RCNN SA0 grouping alternatives."""
import os
import sys
import time

sys.path.insert(0, os.getcwd())

import numpy as np


def timeit(name, fn, *args, n=5):
    import jax

    def fence(r):
        x = jax.tree_util.tree_leaves(r)[0]
        np.asarray(x.ravel()[:8])  # slice on device; fetch 8 elems only

    fence(fn(*args))
    t0 = time.time()
    for _ in range(n):
        fence(fn(*args))
    dt = (time.time() - t0) / n * 1000
    print(f'{name}: {dt:.1f} ms', flush=True)
    return dt


def main():
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _full_batch, _full_config
    from epnet_tpu.models.epnet import EPNet, _pool_for_eval
    from epnet_tpu.models.rcnn import RCNNNet

    cfg = _full_config()
    B = 8
    batch = _full_batch(cfg, batch_size=B)
    model = EPNet(cfg, mode='TEST')
    init = jax.jit(lambda r, b: model.init(r, b, train=False))
    variables = init(
        {'params': jax.random.PRNGKey(0), 'sampling': jax.random.PRNGKey(1),
         'dropout': jax.random.PRNGKey(2)},
        batch)
    db = jax.device_put(batch)
    dv = jax.device_put(variables)

    @jax.jit
    def full(v, b):
        out = model.apply(v, b, train=False)
        return jnp.sum(out['rcnn_cls']) + jnp.sum(out['rcnn_reg'])

    t_full = timeit('full eval fwd (B8)', full, dv, db)
    print(f'  -> {B / (t_full / 1000):.1f} scans/sec', flush=True)

    # --- micro: RCNN SA0 grouping shapes --------------------------------
    from epnet_tpu.ops.pointops import group_points

    rng = np.random.RandomState(0)
    T, N, M, S, C = B * 100, 512, 128, 64, 131
    for dt_name, dt in (('f32', np.float32), ('bf16', jnp.bfloat16)):
        tbl = jax.device_put(rng.rand(T, N, C).astype(np.float32)).astype(dt)
        idx = jax.device_put(rng.randint(0, N, (T, M * S)).astype(np.int32))
        g = jax.jit(lambda t, i: jnp.sum(group_points(t, i.reshape(T, M, S))
                                         .astype(jnp.float32)))
        timeit(f'rcnn-sa0 group_points one-hot {dt_name} (T{T},N{N},K{M*S},C{C})',
               g, tbl, idx)
        g2 = jax.jit(lambda t, i: jnp.sum(
            jnp.take_along_axis(t, i[..., None], axis=1).astype(jnp.float32)))
        timeit(f'rcnn-sa0 row-gather {dt_name}', g2, tbl, idx)

    # --- stage: eval pooling + rcnn tower -------------------------------
    rpn_feats = jax.device_put(rng.rand(B, 16384, 128).astype(np.float32))
    xyz = jax.device_put(np.asarray(batch['pts_input']))
    seg = jax.device_put((rng.rand(B, 16384) > 0.5).astype(np.float32))
    depth = jax.device_put(rng.rand(B, 16384).astype(np.float32) * 70)
    rois = np.zeros((B, 100, 7), np.float32)
    rois[..., 0] = rng.uniform(-20, 20, (B, 100))
    rois[..., 2] = rng.uniform(5, 60, (B, 100))
    rois[..., 3:6] = (1.5, 1.6, 3.9)
    rois = jax.device_put(rois)

    pool = jax.jit(lambda r, x, f, s, d: _pool_for_eval(cfg, r, x, f, s, d))
    pooled = pool(rois, xyz, rpn_feats, seg, depth)
    timeit('eval roipool+canonical (B8x100)', pool, rois, xyz, rpn_feats, seg, depth)
    print('pooled', pooled.shape, pooled.dtype, flush=True)

    rcnn = RCNNNet(cfg)
    rinit = jax.jit(lambda r, p: rcnn.init(r, p, train=False))
    rv = rinit({'params': jax.random.PRNGKey(0), 'dropout': jax.random.PRNGKey(1)},
               pooled)
    rfwd = jax.jit(lambda v, p: jnp.sum(rcnn.apply(v, p, train=False)['rcnn_cls']))
    timeit('rcnn tower fwd (800 rois)', rfwd, rv, pooled)

    # --- stage: rpn backbone --------------------------------------------
    from epnet_tpu.models.rpn import RPN

    rpn = RPN(cfg)
    rpinit = jax.jit(lambda r, b: rpn.init(
        r, b['pts_input'], image=b['img'], xy=b['pts_origin_xy'], train=False))
    rpv = rpinit({'params': jax.random.PRNGKey(0),
                  'dropout': jax.random.PRNGKey(1)}, db)
    rpfwd = jax.jit(lambda v, b: jnp.sum(rpn.apply(
        v, b['pts_input'], image=b['img'], xy=b['pts_origin_xy'],
        train=False)['rpn_cls']))
    timeit('rpn backbone fwd (B8)', rpfwd, rpv, db)

    # --- stage: proposal layer ------------------------------------------
    from epnet_tpu.models.proposal import ProposalLayer

    pl_ = ProposalLayer(cfg, 'TEST')
    scores = jax.device_put(rng.randn(B, 16384).astype(np.float32))
    regs = jax.device_put(rng.randn(B, 16384, 76).astype(np.float32) * 0.1)
    prop = jax.jit(lambda s, r, x: pl_(s, r, x)[0])
    timeit('proposal layer (decode+NMS, B8)', prop, scores, regs, xyz)


if __name__ == '__main__':
    main()
