"""FULL-SCALE block-local quality repro (round 5).

The paired-seed AP campaign collapsed every block-local cell at full
pipeline scale (seed 0 moderate 3D AP: parity 16.3, block+approx 0.88,
block+exact-residual 0.43 — so the approx residual queries are NOT the
cause), while the round-3 N=2048 structured-overfit ablation and the
round-4 'block' isolation cell (which, it turns out, never engaged
block-local — its gate required the approx policy) both said "neutral".
Symptom shape: rpn_iou (point cls) healthy 0.78-0.79, rpn recall@0.5
(box regression) 0.73 -> 0.37 — localization, not segmentation.

This harness reproduces the comparison at the FULL flagship scale
(N=16384, published SA budgets, bf16, structured scenes) with a 300-step
overfit — minutes instead of the 40-epoch pin — and bisects:

    dense        — no block-local anywhere (the round-5 fallback headline)
    block        — RPN + RCNN block-local (the collapsed config)
    block_sa     — RPN SA grouping only (FP dense via EPNET_FP_BLOCK=0,
                   RCNN dense)
    block_fp     — RPN block-local with SA forced dense?? (not expressible;
                   instead:) RPN block (SA+FP) with RCNN dense
    block_rcnn   — RCNN windowed only (RPN dense; loader still Morton-sorts
                   when RPN.BLOCK_LOCAL is on, so this uses RPN off +
                   RCNN on, which disables the RCNN windowed path's sorted
                   precondition — documented no-op check)

Run: python tools/block_local_fullscale.py [dense block block_sa ...]
(on the real chip; each config ~3-8 min incl. compile).

Measured 2026-08-21 (B2, 300 steps, seed 0; per-gt best IoU of top-10
proposals, 6 gts/scene — see run log in ROADMAP.md).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import epnet_tpu  # noqa: F401

import jax
import jax.numpy as jnp


def per_gt_iou(res, batch):
    from epnet_tpu.ops.rotated_iou import boxes_iou3d
    out = []
    for b in range(batch['gt_boxes3d'].shape[0]):
        gt = batch['gt_boxes3d'][b]
        gt = gt[np.abs(gt).sum(axis=1) > 0]
        order = np.argsort(-res['norm_scores'][b])
        top = res['pred_boxes3d'][b][order[:10]]
        iou = np.asarray(boxes_iou3d(jnp.asarray(top), jnp.asarray(gt)))
        out.extend(iou.max(axis=0).tolist())
    return out


def run(name, cfg, batch, steps=300):
    from epnet_tpu.eval.detect import make_joint_eval_step
    from epnet_tpu.models.epnet import EPNet
    from epnet_tpu.train.trainer import (create_train_state, device_batch,
                                         jit_multi_train_step)

    seed = int(os.environ.get('ABLATE_SEED', '0'))
    state, model, tx = create_train_state(cfg, jax.random.PRNGKey(seed),
                                          batch, total_steps=steps)
    multi = jit_multi_train_step(cfg, model, tx)
    db = device_batch(batch)
    K = 10
    stacked = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x[None], (K,) + x.shape), db)
    key = jax.random.PRNGKey(seed + 3)
    t0 = time.time()
    for _ in range(steps // K):
        state, tb = multi(state, stacked, key, jnp.float32(0.1))
    variables = {'params': state.params, 'batch_stats': state.batch_stats}
    eval_step = make_joint_eval_step(cfg, EPNet(cfg, mode='TEST'))
    ious = per_gt_iou(jax.device_get(eval_step(variables, db)), batch)
    print(f'{name}: loss {float(np.asarray(tb["loss"])):.3f} '
          f'({time.time() - t0:.0f}s), per-gt IoU '
          f'{[round(v, 3) for v in ious]} (min {min(ious):.3f} '
          f'mean {np.mean(ious):.3f})', flush=True)
    return ious


def cfg_for(kind):
    from __graft_entry__ import _full_config
    os.environ.pop('EPNET_FP_BLOCK', None)
    os.environ['EPNET_BLOCK_LOCAL'] = '1'
    os.environ['EPNET_RCNN_WIN'] = '1'
    if kind == 'dense':
        os.environ['EPNET_BLOCK_LOCAL'] = '0'
        os.environ['EPNET_RCNN_WIN'] = '0'
    elif kind == 'block':
        pass
    elif kind == 'block_sa':
        os.environ['EPNET_FP_BLOCK'] = '0'
        os.environ['EPNET_RCNN_WIN'] = '0'
    elif kind == 'block_rpn':
        os.environ['EPNET_RCNN_WIN'] = '0'
    elif kind == 'block_fp':
        # SA dense is not separately expressible; this keeps RPN block
        # (SA+FP) and drops RCNN — same as block_rpn, kept for clarity
        os.environ['EPNET_RCNN_WIN'] = '0'
    else:
        raise SystemExit(f'unknown config {kind}')
    cfg = _full_config()
    # overfit hygiene: no dropout, modest budgets for a B2 fast loop
    return cfg.merged({
        'RPN': {'DP_RATIO': 0.0},
        'TRAIN': {'RPN_PRE_NMS_TOP_N': 2048, 'RPN_POST_NMS_TOP_N': 128,
                  'LR': 0.01},
        'TEST': {'RPN_PRE_NMS_TOP_N': 2048, 'RPN_POST_NMS_TOP_N': 64},
    })


def main():
    from __graft_entry__ import _full_batch
    kinds = sys.argv[1:] or ['dense', 'block']
    for kind in kinds:
        cfg = cfg_for(kind)
        batch = _full_batch(cfg, batch_size=2, seed=7, with_labels=True)
        run(kind, cfg, batch)


if __name__ == '__main__':
    main()
