"""Trace a jitted step on the axon TPU and attribute device time by module.

Usage: python tools/trace_attr.py {train|eval} [batch_size]

Correlates the profiler trace's per-op durations with the compiled HLO's
``op_name`` metadata (fetched via the AOT ``compiled.as_text()`` — the axon
backend compiles server-side, so ``--xla_dump_to`` produces nothing locally).
Prints a per-module fwd/bwd breakdown plus the top unattributed ops.
"""
import collections
import glob
import gzip
import json
import os
import re
import sys

sys.path.insert(0, os.getcwd())

import numpy as np


def build_batch(cfg, B):
    from __graft_entry__ import _full_batch
    batch = _full_batch(cfg, batch_size=B, seed=0)
    rng = np.random.RandomState(1)
    N = cfg.RPN.NUM_POINTS
    G = 20
    batch['gt_boxes3d'] = np.stack(
        [rng.uniform(-30, 30, (B, G)), rng.uniform(0.8, 1.6, (B, G)),
         rng.uniform(5, 60, (B, G)), rng.uniform(1.4, 1.7, (B, G)),
         rng.uniform(1.5, 1.7, (B, G)), rng.uniform(3.5, 4.2, (B, G)),
         rng.uniform(-np.pi, np.pi, (B, G))], -1).astype(np.float32)
    batch['rpn_cls_label'] = (rng.rand(B, N) > 0.95).astype(np.int32)
    reg = np.zeros((B, N, 7), np.float32)
    reg[..., 3:6] = 1.5
    batch['rpn_reg_label'] = reg
    return batch


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else 'train'
    import jax
    import jax.numpy as jnp
    from __graft_entry__ import _full_config
    from epnet_tpu.train.trainer import (create_train_state, device_batch,
                                         jit_train_step)

    cfg = _full_config()
    B = int(sys.argv[2]) if len(sys.argv) > 2 else (4 if mode == 'train' else 8)
    batch = build_batch(cfg, B)
    state, model, tx = create_train_state(cfg, jax.random.PRNGKey(0), batch,
                                          total_steps=100)
    db = jax.device_put(device_batch(batch))
    key = jax.random.PRNGKey(0)

    if mode == 'train':
        step = jit_train_step(cfg, model, tx)
        args = (state, db, key, jnp.float32(0.1))

        def run():
            _, tb = step(*args)
            np.asarray(tb['loss'])
    else:
        from epnet_tpu.eval.detect import make_joint_eval_step
        step = make_joint_eval_step(cfg, model)
        variables = {'params': state.params, 'batch_stats': state.batch_stats}
        args = (variables, db)

        def run():
            out = step(*args)
            leaf = jax.tree_util.tree_leaves(out)[0]
            np.asarray(leaf).ravel()[:8]

    run()  # compile + warm
    tdir = '/root/repo/output/trace_' + mode
    jax.profiler.start_trace(tdir)
    for _ in range(2):
        run()
    jax.profiler.stop_trace()

    lowered = step.lower(*args)
    hlo = lowered.compile().as_text()

    meta = {}
    rx = re.compile(r'%([\w.\-]+) = .*?op_name="([^"]+)"')
    for line in hlo.splitlines():
        m = rx.search(line)
        if m:
            meta.setdefault(m.group(1), m.group(2))

    f = sorted(glob.glob(tdir + '/plugins/profile/*/vm.trace.json.gz'))[-1]
    with gzip.open(f) as fh:
        data = json.load(fh)
    pid_names = {}
    for e in data['traceEvents']:
        if e.get('ph') == 'M' and e.get('name') == 'process_name':
            pid_names[e['pid']] = e['args'].get('name', '')
    mod = collections.Counter()
    unattr = collections.Counter()
    for e in data['traceEvents']:
        if e.get('ph') == 'X' and 'dur' in e and \
                'TPU' in pid_names.get(e.get('pid'), ''):
            n = e['name']
            if n in ('1', '2', '3') or n.startswith('jit_'):
                continue
            op = meta.get(n)
            if op is None:
                unattr[n] += e['dur']
                continue
            p = op
            direction = 'bwd' if 'transpose(jvp' in p else 'fwd'
            p = re.sub(r'jit\(step_fn\)/', '', p)
            p = re.sub(r'jit\(eval_step\)/', '', p)
            p = re.sub(r'(transpose\()?j?vp\(EPNet\)\)?/', '', p)
            parts = p.split('/')
            if parts[0] == 'rpn' and len(parts) > 2 and parts[1] == 'backbone':
                key = '/'.join(parts[:3])
            else:
                key = '/'.join(parts[:2])
            mod[(key, direction)] += e['dur']
    print('attributed %.1f ms; unattributed %.1f ms'
          % (sum(mod.values()) / 2000, sum(unattr.values()) / 2000))
    for k, v in mod.most_common(30):
        print(f'{v/2000:8.1f} ms  {k}')
    print('--- top unattributed')
    for k, v in unattr.most_common(8):
        print(f'{v/2000:8.1f} ms  {k}')


if __name__ == '__main__':
    main()
