"""Attribute the backward-pass cost by parameter subtree.

The full B4 train step is ~342 ms with a ~77 ms forward; grads w.r.t. a
single module subtree (others frozen) isolate which VJP region carries the
other ~260 ms. Pass subtree names as argv (default: a curated list) so runs
can be split across invocations (each is a separate ~10 min XLA compile).
"""
import os
import sys
import time

sys.path.insert(0, os.getcwd())

import numpy as np

K = 4


def main():
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _full_batch, _full_config
    from epnet_tpu.train.loss import joint_loss
    from epnet_tpu.train.trainer import create_train_state, device_batch

    cfg = _full_config()
    B = 4
    batch = _full_batch(cfg, batch_size=B, seed=0)
    rng = np.random.RandomState(1)
    N = cfg.RPN.NUM_POINTS
    G = 20
    gt = np.stack([rng.uniform(-30, 30, (B, G)), rng.uniform(0.8, 1.6, (B, G)),
                   rng.uniform(5, 60, (B, G)), rng.uniform(1.4, 1.7, (B, G)),
                   rng.uniform(1.5, 1.7, (B, G)), rng.uniform(3.5, 4.2, (B, G)),
                   rng.uniform(-np.pi, np.pi, (B, G))],
                  axis=-1).astype(np.float32)
    batch['gt_boxes3d'] = gt
    batch['rpn_cls_label'] = (rng.rand(B, N) > 0.95).astype(np.int32)
    reg = np.zeros((B, N, 7), np.float32)
    reg[..., 3:6] = 1.5
    batch['rpn_reg_label'] = reg

    state, model, tx = create_train_state(cfg, jax.random.PRNGKey(0), batch,
                                          total_steps=100)
    db = jax.device_put(device_batch(batch))
    key = jax.random.PRNGKey(0)
    bnm = jnp.float32(0.1)
    rngs = {'sampling': key, 'dropout': key}

    import flax

    params = flax.core.unfreeze(state.params)
    rpn = params['rpn']
    bb = rpn['backbone']
    print('rpn keys:', sorted(rpn.keys()), flush=True)
    print('backbone keys:', sorted(bb.keys()), flush=True)

    def select(tree, path):
        """Split `tree` into (subtree-at-path wrapped, rebuild(sub) fn)."""
        def rebuild(sub):
            import copy
            t = jax.tree_util.tree_map(lambda x: x, tree)  # shallow-ish copy
            node = t
            for p in path[:-1]:
                node = node[p]
            node[path[-1]] = sub
            return t
        node = tree
        for p in path:
            node = node[p]
        return node, rebuild

    def time_subtree(label, path):
        sub, rebuild = select(params, path)

        def loss_fn(subp, b):
            full = rebuild(subp)
            out, _ = model.apply(
                {'params': full, 'batch_stats': state.batch_stats}, b,
                train=True, bn_momentum=bnm, mutable=['batch_stats'],
                rngs=rngs)
            loss, _ = joint_loss(cfg, out, b)
            return loss

        def mk(k):
            @jax.jit
            def f(subp, b):
                def body(acc, i):
                    bb_ = dict(b)
                    bb_['pts_input'] = b['pts_input'] + i * 1e-5
                    g = jax.grad(loss_fn)(subp, bb_)
                    return acc + sum(jnp.sum(x.astype(jnp.float32) ** 2)
                                     for x in jax.tree_util.tree_leaves(g)), 0.0
                acc, _ = jax.lax.scan(body, 0.0,
                                      jnp.arange(k, dtype=jnp.float32))
                return acc
            return f

        def run(k):
            f = mk(k)
            np.asarray(f(sub, db))
            t0 = time.time()
            for _ in range(2):
                np.asarray(f(sub, db))
            return (time.time() - t0) / 2

        t1 = run(1)
        tk = run(K)
        per = (tk - t1) / (K - 1) * 1000
        print(f'grad wrt {label}: {per:.1f} ms/iter (t1={t1*1e3:.0f})',
              flush=True)

    targets = {
        'rcnn': ['rcnn'],
        'rpn-heads': ['rpn', 'cls_out'],
        'img-tower': ['rpn', 'backbone', 'img_block0'],
        'point-sa0': ['rpn', 'backbone', 'sa0'],
        'point-sa3': ['rpn', 'backbone', 'sa3'],
        'fp0': ['rpn', 'backbone', 'fp0'],
        'fusion0': ['rpn', 'backbone', 'fusion0'],
        'final-fusion': ['rpn', 'backbone', 'final_fusion'],
    }
    names = sys.argv[1:] or list(targets)
    for n in names:
        time_subtree(n, targets[n])


if __name__ == '__main__':
    main()
