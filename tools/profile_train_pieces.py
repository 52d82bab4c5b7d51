"""Scan-timed decomposition of the train step on the real chip.

Times (K in-graph iterations, perturbed inputs): full step, forward-only
loss, value_and_grad without the optimizer, and the optimizer update —
their differences attribute cost to fwd / bwd / opt. See
tools/profile_train.py for the end-to-end number.
"""
import os
import sys
import time

sys.path.insert(0, os.getcwd())

import numpy as np

K = 6


def scan_time(name, make_fn, *args):
    import jax
    import jax.numpy as jnp

    def run_k(k):
        fn = make_fn(k)
        np.asarray(jax.tree_util.tree_leaves(fn(*args))[0]).ravel()[:4]
        t0 = time.time()
        for _ in range(2):
            np.asarray(jax.tree_util.tree_leaves(fn(*args))[0]).ravel()[:4]
        return (time.time() - t0) / 2

    t1 = run_k(1)
    tk = run_k(K)
    per = (tk - t1) / (K - 1) * 1000
    print(f'{name}: {per:.1f} ms', flush=True)
    return per


def main():
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _full_batch, _full_config
    from epnet_tpu.train.loss import joint_loss
    from epnet_tpu.train.trainer import (create_train_state, device_batch,
                                         jit_train_step)

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

    from epnet_tpu.models.epnet import EPNet

    state, model, tx = create_train_state(cfg, jax.random.PRNGKey(0), batch,
                                          total_steps=100)
    db = jax.device_put(device_batch(batch))
    key = jax.random.PRNGKey(0)
    bnm = jnp.float32(0.1)

    def loss_fn(params, b, rngs):
        out, updates = model.apply(
            {'params': params, 'batch_stats': state.batch_stats}, b,
            train=True, bn_momentum=bnm, rngs=rngs,
            mutable=['batch_stats'])
        loss, tb = joint_loss(cfg, out, b)
        return loss, (tb, updates)

    rngs = {'dropout': key, 'sampling': key}

    def mk_fwd(k):
        @jax.jit
        def f(params, b):
            def body(acc, i):
                bb = dict(b)
                bb['pts_input'] = b['pts_input'] + i * 1e-5
                loss, _ = loss_fn(params, bb, rngs)
                return acc + loss, 0.0
            acc, _ = jax.lax.scan(body, 0.0, jnp.arange(k, dtype=jnp.float32))
            return acc
        return f

    def mk_grad(k):
        @jax.jit
        def f(params, b):
            def body(acc, i):
                bb = dict(b)
                bb['pts_input'] = b['pts_input'] + i * 1e-5
                (loss, _), g = jax.value_and_grad(loss_fn, has_aux=True)(
                    params, bb, rngs)
                # consume EVERY grad leaf — touching just one lets XLA
                # dead-code-eliminate the rest of the backward pass
                gsum = sum(jnp.sum(l) for l in jax.tree_util.tree_leaves(g))
                return acc + loss + gsum, 0.0
            acc, _ = jax.lax.scan(body, 0.0, jnp.arange(k, dtype=jnp.float32))
            return acc
        return f

    t_f = scan_time('fwd only (loss, B4)', mk_fwd, state.params, db)
    t_g = scan_time('fwd+bwd (value_and_grad, B4)', mk_grad, state.params, db)
    print(f'  -> bwd alone ~{t_g - t_f:.1f} ms', flush=True)

    step = jit_train_step(cfg, model, tx)

    def fence(s):
        np.asarray(s[1]['loss'])

    s2, tb = step(state, db, key, bnm)
    fence((s2, tb))
    t0 = time.time()
    for _ in range(3):
        s2, tb = step(s2, db, key, bnm)
        fence((s2, tb))
    print(f'full step (dispatch-inclusive): {(time.time()-t0)/3*1000:.1f} ms',
          flush=True)


if __name__ == '__main__':
    main()
