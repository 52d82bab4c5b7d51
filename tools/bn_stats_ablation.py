"""BN-statistics ablation: global-batch stats (our GSPMD default) vs the
reference's effective per-device stats under torch.nn.DataParallel
(train_rcnn.py:221-222 replicates the model; each replica normalizes its
batch/n_gpus slice locally, e.g. 3 scans/GPU in the published 2-GPU batch-6
recipe). SURVEY.md §7 flags this semantics delta as a parity risk; this
script measures it on the structured-synthetic overfit (VERDICT r1 item 9).

Run (CPU is fine — the question is statistics, not speed):
    python tools/bn_stats_ablation.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), 'tests'))

import jax

# Pin CPU before anything initializes a backend: the question here is
# statistics, not speed, and jax.default_backend() would already boot the
# (slow, tunnelled) axon TPU plugin just to ask.
jax.config.update('jax_platforms', 'cpu')

import jax.numpy as jnp
import numpy as np

from epnet_tpu.eval.detect import make_joint_eval_step
from epnet_tpu.models import layers
from epnet_tpu.models.epnet import EPNet
from epnet_tpu.ops.rotated_iou import boxes_iou3d
from epnet_tpu.train.trainer import create_train_state, jit_train_step
from epnet_tpu.utils.testing import synthetic_batch, tiny_config


def run(groups: int, steps=300, batch=4, seed=11):
    layers.BN_STAT_GROUPS = groups
    try:
        cfg = tiny_config().merged({
            'TRAIN': {'LR': 0.02, 'RPN_PRE_NMS_TOP_N': 128,
                      'RPN_POST_NMS_TOP_N': 32},
            'RPN': {'DP_RATIO': 0.0},
        })
        rng = np.random.RandomState(seed)
        b = synthetic_batch(rng, cfg, batch=batch, structured=True)
        state, model, tx = create_train_state(cfg, jax.random.PRNGKey(0), b,
                                              total_steps=steps)
        step = jit_train_step(cfg, model, tx)
        key = jax.random.PRNGKey(3)
        losses = []
        for _ in range(steps):
            state, tb = step(state, b, key, jnp.float32(0.1))
            losses.append(float(tb['loss']))
        eval_model = EPNet(cfg, mode='TEST')
        eval_step = make_joint_eval_step(cfg, eval_model)
        variables = {'params': state.params, 'batch_stats': state.batch_stats}
        res = jax.device_get(eval_step(variables, b))
        ious = []
        for i in range(batch):
            order = np.argsort(-res['norm_scores'][i])
            top = res['pred_boxes3d'][i][order[:10]]
            iou = np.asarray(boxes_iou3d(jnp.asarray(top),
                                         jnp.asarray(b['gt_boxes3d'][i])))
            ious.append(float(iou.max()))
        return losses, ious
    finally:
        layers.BN_STAT_GROUPS = 1


def main():
    for groups, label in ((1, 'global-batch BN (GSPMD default)'),
                          (2, 'per-device BN, 2 emulated devices'),
                          (4, 'per-device BN, 4 emulated devices')):
        t0 = time.time()
        losses, ious = run(groups)
        print(f'groups={groups} [{label}]: loss {losses[0]:.3f} -> '
              f'{losses[-1]:.3f} (mean last 20: '
              f'{np.mean(losses[-20:]):.3f}), best-IoU/scene='
              f'{[round(v, 3) for v in ious]} ({time.time() - t0:.0f}s)',
              flush=True)


if __name__ == '__main__':
    main()
