"""Dump the optimized train-step HLO and summarize the largest-shape ops —
finds what actually moves the ~274 GB the cost analysis reports."""
import os
import re
import sys
from collections import Counter

sys.path.insert(0, os.getcwd())

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _full_batch, _full_config
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
    step = jit_train_step(cfg, model, tx)
    c = step.lower(state, db, key, jnp.float32(0.1)).compile()
    try:
        ma = c.memory_analysis()
        print('temp bytes: %.2f GB, args %.2f GB, out %.2f GB, peak %.2f GB'
              % (ma.temp_size_in_bytes / 1e9,
                 ma.argument_size_in_bytes / 1e9,
                 ma.output_size_in_bytes / 1e9,
                 getattr(ma, 'peak_memory_in_bytes', 0) / 1e9), flush=True)
    except Exception as e:
        print('memory_analysis failed:', e, flush=True)

    txt = c.as_text()
    print(f'HLO text: {len(txt)/1e6:.1f} MB', flush=True)
    open('/tmp/train_step.hlo', 'w').write(txt)

    dt_bytes = {'f32': 4, 'bf16': 2, 's32': 4, 'u32': 4, 'pred': 1, 'f16': 2,
                's8': 1, 'u8': 1, 's16': 2, 'u16': 2, 'f64': 8, 's64': 8}
    # count bytes by (op kind, shape) for every op line
    pat = re.compile(r'^\s*(?:ROOT\s+)?%?[\w.\-]+ = (\w+)\[([\d,]*)\][^ ]* (\w+)')
    sizes = Counter()
    for line in txt.splitlines():
        m = pat.match(line)
        if not m:
            continue
        dt, shape, kind = m.groups()
        if dt not in dt_bytes or kind in ('parameter', 'constant', 'tuple',
                                          'get-tuple-element', 'bitcast'):
            continue
        n = 1
        for s in shape.split(','):
            if s:
                n *= int(s)
        sizes[(kind, dt, shape)] += n * dt_bytes[dt]
    print('--- top 25 output-bytes (op kind, dtype, shape, total GB, count is folded in):')
    for (kind, dt, shape), b in sizes.most_common(25):
        print(f'{b/1e9:8.2f} GB  {kind:18s} {dt}[{shape}]', flush=True)


if __name__ == '__main__':
    main()
