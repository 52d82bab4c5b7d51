"""Stage-1 sampling ablation: exact FPS vs partitioned FPS vs random.

The reference always uses furthest-point sampling (sampling_gpu.cu:93-253);
on TPU the sequential FPS chain is a top-3 line item of the eval profile, so
two speed modes ship behind knobs:

  * ``RPN.SAMPLING=random`` — take the first npoint indices of the
    already-shuffled cloud (no selection at all);
  * ``RPN.FPS_GROUPS=G`` — partitioned FPS: exact FPS on G interleaved
    index-slices, dividing the sequential selection depth by G
    (ops/pointops.py:furthest_point_sample).

Each mode is trained AND evaluated with its own sampler (the fair test —
features co-adapt to the sampling pattern, see ROADMAP query-policy
ablation), then cross-evaluated against the exact-FPS-trained weights to
show the eval-time-swap hazard.

Run: python tools/sampling_ablation.py        (CPU, ~15 min)
     ABLATE_PLATFORM=tpu python tools/...     (on-chip)
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

_plat = os.environ.get('ABLATE_PLATFORM', 'cpu')
if _plat == 'cpu':
    # only pin CPU explicitly: the axon TPU plugin self-registers and
    # breaks if jax_platforms names 'tpu' directly
    jax.config.update('jax_platforms', 'cpu')

import jax.numpy as jnp
import numpy as np

from epnet_tpu.eval.detect import make_joint_eval_step
from epnet_tpu.models.epnet import EPNet
from epnet_tpu.ops.rotated_iou import boxes_iou3d
from epnet_tpu.train.trainer import create_train_state, jit_train_step
from epnet_tpu.utils.testing import synthetic_batch, tiny_config

MODES = (
    ('fps', {'SAMPLING': 'fps', 'FPS_GROUPS': 1}),
    ('fps-G8', {'SAMPLING': 'fps', 'FPS_GROUPS': 8}),
    ('random', {'SAMPLING': 'random'}),
)


def per_gt_iou(res, batch):
    out = []
    for b in range(batch['gt_boxes3d'].shape[0]):
        gt = batch['gt_boxes3d'][b]
        order = np.argsort(-res['norm_scores'][b])
        top = res['pred_boxes3d'][b][order[:10]]
        iou = np.asarray(boxes_iou3d(jnp.asarray(top), jnp.asarray(gt)))
        out.extend(iou.max(axis=0).tolist())
    return out


def evaluate(cfg, rpn_over, variables, batch):
    ecfg = cfg.merged({'RPN': rpn_over})
    eval_step = make_joint_eval_step(ecfg, EPNet(ecfg, mode='TEST'))
    return per_gt_iou(jax.device_get(eval_step(variables, batch)), batch)


def main():
    base = tiny_config().merged({
        'TRAIN': {'LR': 0.02, 'RPN_PRE_NMS_TOP_N': 128,
                  'RPN_POST_NMS_TOP_N': 32},
        'RPN': {'DP_RATIO': 0.0},
    })
    rng = np.random.RandomState(11)
    batch = synthetic_batch(rng, base, batch=2, structured=True)

    trained = {}
    for name, over in MODES:
        cfg = base.merged({'RPN': over})
        state, model, tx = create_train_state(cfg, jax.random.PRNGKey(0),
                                              batch, total_steps=300)
        step = jit_train_step(cfg, model, tx)
        key = jax.random.PRNGKey(3)
        t0 = time.time()
        for _ in range(300):
            state, tb = step(state, batch, key, jnp.float32(0.1))
        variables = {'params': state.params, 'batch_stats': state.batch_stats}
        trained[name] = (cfg, over, variables)
        ious = evaluate(cfg, over, variables, batch)
        print(f'{name}: trained (loss {float(tb["loss"]):.3f}, '
              f'{time.time() - t0:.0f}s); consistent-eval per-gt IoU '
              f'{[round(v, 3) for v in ious]} (min {min(ious):.3f})',
              flush=True)

    # eval-time swaps against the exact-FPS-trained weights
    cfg, _, variables = trained['fps']
    for name, over in MODES[1:]:
        ious = evaluate(cfg, over, variables, batch)
        print(f'fps-trained evaled with {name}: per-gt IoU '
              f'{[round(v, 3) for v in ious]} (min {min(ious):.3f})',
              flush=True)


if __name__ == '__main__':
    main()
