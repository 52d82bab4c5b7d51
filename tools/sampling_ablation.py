"""FPS-vs-random sampling ablation (RPN.SAMPLING knob).

The reference always uses furthest-point sampling (sampling_gpu.cu:93-253);
on TPU the sequential FPS chain costs ~12 ms of a ~125 ms B8 eval call, so
`RPN.SAMPLING=random` (take the first npoint indices of the already-shuffled
cloud) ships as a speed mode. This quantifies its accuracy cost: train the
tiny detector on a structured scene WITH FPS, then evaluate with each
sampler and compare per-gt localization (VERDICT r1 item 3's
"quality-validated bypass" evidence).

Run: python tools/sampling_ablation.py   (CPU, ~5 min)
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update('jax_platforms', 'cpu')

import jax.numpy as jnp
import numpy as np

from epnet_tpu.eval.detect import make_joint_eval_step
from epnet_tpu.models.epnet import EPNet
from epnet_tpu.ops.rotated_iou import boxes_iou3d
from epnet_tpu.train.trainer import create_train_state, jit_train_step
from epnet_tpu.utils.testing import synthetic_batch, tiny_config


def main():
    cfg = tiny_config().merged({
        'TRAIN': {'LR': 0.02, 'RPN_PRE_NMS_TOP_N': 128,
                  'RPN_POST_NMS_TOP_N': 32},
        'RPN': {'DP_RATIO': 0.0},
    })
    rng = np.random.RandomState(11)
    batch = synthetic_batch(rng, cfg, batch=2, structured=True)
    state, model, tx = create_train_state(cfg, jax.random.PRNGKey(0), batch,
                                          total_steps=300)
    step = jit_train_step(cfg, model, tx)
    key = jax.random.PRNGKey(3)
    t0 = time.time()
    for _ in range(300):
        state, tb = step(state, batch, key, jnp.float32(0.1))
    print(f'trained with FPS: loss {float(tb["loss"]):.3f} '
          f'({time.time() - t0:.0f}s)', flush=True)

    variables = {'params': state.params, 'batch_stats': state.batch_stats}
    for sampler in ('fps', 'random'):
        ecfg = cfg.merged({'RPN': {'SAMPLING': sampler}})
        eval_model = EPNet(ecfg, mode='TEST')
        eval_step = make_joint_eval_step(ecfg, eval_model)
        res = jax.device_get(eval_step(variables, batch))
        per_gt = []
        for b in range(2):
            gt = batch['gt_boxes3d'][b]
            order = np.argsort(-res['norm_scores'][b])
            top = res['pred_boxes3d'][b][order[:10]]
            iou = np.asarray(boxes_iou3d(jnp.asarray(top), jnp.asarray(gt)))
            per_gt.extend(iou.max(axis=0).tolist())
        print(f'eval sampler={sampler}: per-gt IoU '
              f'{[round(v, 3) for v in per_gt]} (min {min(per_gt):.3f})',
              flush=True)


if __name__ == '__main__':
    main()
