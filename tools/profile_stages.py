"""Stage-wise timing of the full-scale train/eval path on the real chip."""
import os
import sys
import time

sys.path.insert(0, os.getcwd())

import numpy as np


def timeit(name, fn, *args, n=5):
    import jax

    r = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(r)[0])
    t0 = time.time()
    for _ in range(n):
        r = fn(*args)
        np.asarray(jax.tree_util.tree_leaves(r)[0])
    print(f'{name}: {(time.time()-t0)/n*1000:.1f} ms', flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _full_batch, _full_config
    from epnet_tpu.models.proposal import ProposalLayer
    from epnet_tpu.models.rpn import RPN
    from epnet_tpu.models.target_assign import proposal_target_layer
    from epnet_tpu.train.loss import rpn_loss

    cfg = _full_config()
    B = 4
    batch = _full_batch(cfg, batch_size=B)
    rng = np.random.RandomState(1)
    N = cfg.RPN.NUM_POINTS
    batch['rpn_cls_label'] = (rng.rand(B, N) > 0.95).astype(np.int32)
    reg = np.zeros((B, N, 7), np.float32)
    reg[..., 3:6] = 1.5
    batch['rpn_reg_label'] = reg
    G = 20
    gt = np.stack([rng.uniform(-30, 30, (B, G)), rng.uniform(0.8, 1.6, (B, G)),
                   rng.uniform(5, 60, (B, G)), rng.uniform(1.4, 1.7, (B, G)),
                   rng.uniform(1.5, 1.7, (B, G)), rng.uniform(3.5, 4.2, (B, G)),
                   rng.uniform(-np.pi, np.pi, (B, G))], axis=-1).astype(np.float32)

    model = RPN(cfg)
    init = jax.jit(lambda r, b: model.init(
        r, b['pts_input'], image=b['img'], xy=b['pts_origin_xy'], train=False))
    variables = init({'params': jax.random.PRNGKey(0),
                      'dropout': jax.random.PRNGKey(1)}, batch)
    db = jax.device_put(batch)
    gt_d = jax.device_put(gt)

    @jax.jit
    def rpn_fwd(v, b):
        out = model.apply(v, b['pts_input'], image=b['img'],
                          xy=b['pts_origin_xy'], train=False)
        return jnp.sum(out['rpn_cls']) + jnp.sum(out['rpn_reg'])

    @jax.jit
    def rpn_fwd_bwd(v, b):
        def loss(p):
            out, _ = model.apply({'params': p, 'batch_stats': v['batch_stats']},
                                 b['pts_input'], image=b['img'],
                                 xy=b['pts_origin_xy'], train=True,
                                 bn_momentum=jnp.float32(0.1),
                                 mutable=['batch_stats'],
                                 rngs={'dropout': jax.random.PRNGKey(2)})
            l, _ = rpn_loss(cfg, out['rpn_cls'], out['rpn_reg'],
                            b['rpn_cls_label'], b['rpn_reg_label'])
            return l
        return jax.grad(loss)(v['params'])

    @jax.jit
    def rpn_then_proposal(v, b):
        out = model.apply(v, b['pts_input'], image=b['img'],
                          xy=b['pts_origin_xy'], train=False)
        rois, scores, counts = ProposalLayer(cfg, 'TRAIN')(
            out['rpn_cls'][..., 0], out['rpn_reg'], out['backbone_xyz'])
        return jnp.sum(rois) + jnp.sum(counts)

    @jax.jit
    def rpn_proposal_target(v, b, gt):
        out = model.apply(v, b['pts_input'], image=b['img'],
                          xy=b['pts_origin_xy'], train=False)
        scores = out['rpn_cls'][..., 0]
        rois, _, _ = ProposalLayer(cfg, 'TRAIN')(scores, out['rpn_reg'],
                                                 out['backbone_xyz'])
        seg = (jax.nn.sigmoid(scores) > cfg.RPN.SCORE_THRESH).astype(jnp.float32)
        depth = jnp.linalg.norm(out['backbone_xyz'], axis=2)
        tgt = proposal_target_layer(jax.random.PRNGKey(0), rois, gt,
                                    out['backbone_xyz'], out['backbone_features'],
                                    seg, depth, cfg)
        return jnp.sum(tgt.sampled_pts) + jnp.sum(tgt.gt_iou)

    timeit('rpn fwd (eval)', rpn_fwd, variables, db)
    timeit('rpn fwd+bwd (train)', rpn_fwd_bwd, variables, db)
    timeit('rpn fwd + proposal NMS', rpn_then_proposal, variables, db)
    timeit('rpn fwd + proposal + target+pool', rpn_proposal_target, variables, db, gt_d)


if __name__ == '__main__':
    main()
