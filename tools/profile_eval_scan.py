"""Scan-timed stage breakdown of the eval path at bench shapes (B=8).

Each stage runs K times inside one jitted lax.scan (inputs perturbed per
step to defeat CSE) so the ~30 ms axon dispatch floor cancels out:
reported = (t(K) - t(1)) / (K - 1). See memory: axon-profiling-discipline.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

K = 9


def scan_time(name, op, args, perturb):
    import jax
    import jax.numpy as jnp

    def run_k(k):
        @jax.jit
        def f(args):
            def body(acc, i):
                return acc + op(perturb(args, i)), 0.0
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
    from epnet_tpu.eval.detect import make_joint_eval_step
    from epnet_tpu.models.epnet import EPNet, _pool_for_eval
    from epnet_tpu.models.proposal import ProposalLayer
    from epnet_tpu.models.rcnn import RCNNNet
    from epnet_tpu.models.rpn import RPN

    cfg = _full_config()
    B = 8
    batch = {k: jnp.asarray(v) for k, v in _full_batch(cfg, batch_size=B).items()}
    model = EPNet(cfg, mode='TEST')
    variables = jax.jit(lambda b: model.init(jax.random.PRNGKey(0), b,
                                             train=False))(batch)

    def pb(args, i):
        v, b = args
        b = dict(b)
        b['pts_input'] = b['pts_input'] + i * 1e-5
        return v, b

    # 1. full eval step
    estep = make_joint_eval_step(cfg, model)
    scan_time('full eval step', lambda a: jnp.sum(
        estep(a[0], a[1])['pred_boxes3d']), (variables, batch), pb)

    # 2. RPN alone (backbone + heads)
    rpn = RPN(cfg)
    rvars = {'params': variables['params']['rpn'],
             'batch_stats': variables['batch_stats']['rpn']}

    def rpn_fwd(a):
        v, b = a
        out = RPN(cfg).apply(v, b['pts_input'], b.get('img'),
                             b.get('pts_origin_xy'), train=False)
        return jnp.sum(out['rpn_cls']) + jnp.sum(out['rpn_reg'])

    scan_time('rpn fwd (backbone+heads)', rpn_fwd, (rvars, batch), pb)

    # 3. proposal layer at full shapes
    kr = jax.random.PRNGKey(1)
    N = cfg.RPN.NUM_POINTS
    xyz = jax.jit(lambda k: jax.random.uniform(
        k, (B, N, 3), jnp.float32, -35, 35))(kr)
    rcls = jax.jit(lambda k: jax.random.normal(k, (B, N), jnp.float32))(kr)
    rreg = jax.jit(lambda k: 0.05 * jax.random.normal(
        k, (B, N, 76), jnp.float32))(kr)

    prop = ProposalLayer(cfg, 'TEST')

    def prop_fwd(a):
        x, c, r = a
        rois, sc, cnt = prop(c, r, x)
        return jnp.sum(rois) + jnp.sum(sc)

    scan_time('proposal layer (decode+nms)', prop_fwd, (xyz, rcls, rreg),
              lambda a, i: (a[0] + i * 1e-5, a[1] + i * 1e-5, a[2]))

    # 4. roipool + canonical transform
    M = cfg.TEST.RPN_POST_NMS_TOP_N
    rois = jax.jit(lambda k: jnp.concatenate([
        jax.random.uniform(k, (B, M, 3), jnp.float32, -30, 30),
        jnp.full((B, M, 3), 2.0), jnp.zeros((B, M, 1))], -1))(kr)
    feats = jax.jit(lambda k: jax.random.normal(
        k, (B, N, 128), jnp.float32))(kr)
    seg = jnp.ones((B, N), jnp.float32)
    depth = jnp.linalg.norm(xyz, axis=-1)

    def pool_fwd(a):
        r, x, f = a
        return jnp.sum(_pool_for_eval(cfg, r, x, f, seg, depth))

    scan_time('roipool+canonical (B8x100)', pool_fwd, (rois, xyz, feats),
              lambda a, i: (a[0], a[1] + i * 1e-5, a[2]))

    # 5. rcnn tower on pooled input
    C_in = 3 + 1 + 1 + (1 if cfg.RCNN.USE_INTENSITY else 0)  # xyz+mask+depth
    pooled = jax.jit(lambda k: jax.random.normal(
        k, (B * M, cfg.RCNN.NUM_POINTS, C_in + 128), jnp.float32))(kr)
    rcnn = RCNNNet(cfg)
    rcvars = {'params': variables['params']['rcnn'],
              'batch_stats': variables['batch_stats'].get('rcnn', {})}

    def rcnn_fwd(a):
        v, p = a
        out = rcnn.apply(v, p, train=False)
        return jnp.sum(out['rcnn_cls']) + jnp.sum(out['rcnn_reg'])

    scan_time('rcnn tower (800 rois)', rcnn_fwd, (rcvars, pooled),
              lambda a, i: (a[0], a[1] + i * 1e-5))


if __name__ == '__main__':
    main()
