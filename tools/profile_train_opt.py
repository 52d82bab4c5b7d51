"""Isolate the missing ~240ms of the train step: optimizer update cost and
raw scan timings (t1/tK printed) for the value_and_grad scan."""
import os
import sys
import time

sys.path.insert(0, os.getcwd())

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _full_batch, _full_config
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

    nparam = sum(x.size for x in jax.tree_util.tree_leaves(state.params))
    print(f'params: {nparam/1e6:.1f}M', flush=True)

    # --- optimizer update alone, scan-timed ------------------------------
    fake_g = jax.tree_util.tree_map(lambda p: p * 1e-3, state.params)

    def mk_opt(k):
        @jax.jit
        def f(params, opt_state, g):
            def body(carry, i):
                p, o = carry
                gg = jax.tree_util.tree_map(lambda x: x + i * 1e-6, g)
                up, o2 = tx.update(gg, o, p)
                p2 = jax.tree_util.tree_map(lambda a, u: a + u, p, up)
                return (p2, o2), 0.0
            (p, o), _ = jax.lax.scan(body, (params, opt_state),
                                     jnp.arange(k, dtype=jnp.float32))
            return jax.tree_util.tree_leaves(p)[0].ravel()[0]
        return f

    for k in (1, 6):
        f = mk_opt(k)
        np.asarray(f(state.params, state.opt_state, fake_g))
        t0 = time.time()
        for _ in range(3):
            np.asarray(f(state.params, state.opt_state, fake_g))
        print(f'opt-update scan K={k}: {(time.time()-t0)/3*1000:.1f} ms',
              flush=True)


if __name__ == '__main__':
    main()
