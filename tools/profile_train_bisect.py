"""Bisect the train-step cost: scan-time the REAL step_fn (as the trainer
runs it) vs the bare value_and_grad, isolating where the difference lives."""
import os
import sys
import time

sys.path.insert(0, os.getcwd())

import numpy as np

K = 6


def timeit_scan(name, mk, *args):
    import jax

    def run_k(k):
        f = mk(k)
        np.asarray(jax.tree_util.tree_leaves(f(*args))[0]).ravel()[:4]
        t0 = time.time()
        for _ in range(2):
            np.asarray(jax.tree_util.tree_leaves(f(*args))[0]).ravel()[:4]
        return (time.time() - t0) / 2

    t1 = run_k(1)
    tk = run_k(K)
    per = (tk - t1) / (K - 1) * 1000
    print(f'{name}: {per:.1f} ms/iter  (t1={t1*1e3:.0f} ms, tK={tk*1e3:.0f} ms)',
          flush=True)
    return per


def main():
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _full_batch, _full_config
    from epnet_tpu.train.trainer import (create_train_state, device_batch,
                                         make_train_step)

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
    step = make_train_step(cfg, model, tx)

    # the real step_fn, scanned with the carried state (step counter
    # increments -> per-iteration rng folds, exactly like jit_multi)
    def mk_real(k):
        @jax.jit
        def f(state, b):
            def body(s, i):
                bb = dict(b)
                bb['pts_input'] = b['pts_input'] + i * 1e-5
                s2, tb = step(s, bb, key, bnm)
                return s2, tb['loss']
            s, losses = jax.lax.scan(body, state, jnp.arange(k, dtype=jnp.float32))
            return losses
        return f

    timeit_scan('REAL step_fn scanned (B4)', mk_real, state, db)

    # same but with a FROZEN rng fold (state.step not used for rng): if this
    # is much faster, per-iteration rng-dependent work dominates
    def mk_frozen_rng(k):
        k_samp, k_drop = jax.random.split(key)

        def loss_fn(params, bs, bb):
            out, mutated = model.apply(
                {'params': params, 'batch_stats': bs}, bb,
                train=True, bn_momentum=bnm, mutable=['batch_stats'],
                rngs={'sampling': k_samp, 'dropout': k_drop})
            from epnet_tpu.train.loss import joint_loss
            loss, tb = joint_loss(cfg, out, bb)
            return loss, (tb, mutated['batch_stats'])

        @jax.jit
        def f(state, b):
            def body(s, i):
                bb = dict(b)
                bb['pts_input'] = b['pts_input'] + i * 1e-5
                (loss, (tb, bs)), g = jax.value_and_grad(
                    loss_fn, has_aux=True)(s.params, s.batch_stats, bb)
                up, o2 = tx.update(g, s.opt_state, s.params)
                p2 = jax.tree_util.tree_map(lambda a, u: a + u, s.params, up)
                s2 = s.replace(step=s.step + 1, params=p2, batch_stats=bs,
                               opt_state=o2)
                return s2, loss
            s, losses = jax.lax.scan(body, state, jnp.arange(k, dtype=jnp.float32))
            return losses
        return f

    timeit_scan('step w/ frozen rng fold (B4)', mk_frozen_rng, state, db)


if __name__ == '__main__':
    main()
