"""XLA cost_analysis of the train step vs forward-only: FLOPs and bytes
attribute the fwd/bwd gap (compiles reuse .jax_cache)."""
import os
import sys

sys.path.insert(0, os.getcwd())

import numpy as np


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

    state, model, tx = create_train_state(cfg, jax.random.PRNGKey(0), batch,
                                          total_steps=100)
    db = device_batch(batch)
    key = jax.random.PRNGKey(0)
    bnm = jnp.float32(0.1)

    def report(name, compiled):
        ca = compiled.cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        flops = ca.get('flops', float('nan'))
        bytes_ = ca.get('bytes accessed', float('nan'))
        print(f'{name}: {flops/1e9:.1f} GFLOP, {bytes_/1e9:.2f} GB accessed',
              flush=True)
        for k, v in sorted(ca.items()):
            if isinstance(v, (int, float)) and v > 1e9 and 'bytes accessed' in k:
                print(f'    {k}: {v/1e9:.2f} GB', flush=True)

    step = jit_train_step(cfg, model, tx)
    c_step = step.lower(state, db, key, bnm).compile()
    report('full train step (B4)', c_step)

    rngs = {'sampling': key, 'dropout': key}

    @jax.jit
    def fwd(params, b):
        out, _ = model.apply(
            {'params': params, 'batch_stats': state.batch_stats}, b,
            train=True, bn_momentum=bnm, mutable=['batch_stats'], rngs=rngs)
        loss, _ = joint_loss(cfg, out, b)
        return loss

    c_fwd = fwd.lower(state.params, db).compile()
    report('fwd-only (B4)', c_fwd)


if __name__ == '__main__':
    main()
