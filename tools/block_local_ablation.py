"""Block-local grouping quality ablation (structured synthetic overfit).

Trains + evaluates the same tiny-but-not-toy EPNet (N=2048 points so the
block-local gate activates at sa0) in three policies:

  * dense   — the shipped nested approx query (baseline);
  * block   — RPN.BLOCK_LOCAL (Morton-sorted cloud, windowed grouping);
  * swap    — dense-trained weights evaluated with block-local (the
              eval-time-swap hazard check; approx policies must be
              train/eval-consistent, see ROADMAP).

Pass = block-local's train+eval-consistent per-gt IoU matches dense.

Run: python tools/block_local_ablation.py       (CPU, slow)
     ABLATE_PLATFORM=tpu python tools/...       (on-chip, ~5 min)
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


def per_gt_iou(res, batch):
    out = []
    for b in range(batch['gt_boxes3d'].shape[0]):
        gt = batch['gt_boxes3d'][b]
        order = np.argsort(-res['norm_scores'][b])
        top = res['pred_boxes3d'][b][order[:10]]
        iou = np.asarray(boxes_iou3d(jnp.asarray(top), jnp.asarray(gt)))
        out.extend(iou.max(axis=0).tolist())
    return out


def base_config():
    return tiny_config().merged({
        'TRAIN': {'LR': 0.02, 'RPN_PRE_NMS_TOP_N': 256,
                  'RPN_POST_NMS_TOP_N': 32},
        'RPN': {'DP_RATIO': 0.0, 'NUM_POINTS': 2048,
                'SA_CONFIG': {'NPOINTS': (512, 128, 32, 8)},
                'BLOCK_WINDOW': 1024, 'BLOCK_C': 128},
    })


def run(name, cfg, batch, steps=300):
    seed = int(os.environ.get('ABLATE_SEED', '0'))
    state, model, tx = create_train_state(cfg, jax.random.PRNGKey(seed),
                                          batch, total_steps=steps)
    step = jit_train_step(cfg, model, tx)
    key = jax.random.PRNGKey(seed + 3)
    t0 = time.time()
    for _ in range(steps):
        state, tb = step(state, batch, key, jnp.float32(0.1))
    variables = {'params': state.params, 'batch_stats': state.batch_stats}
    eval_step = make_joint_eval_step(cfg, EPNet(cfg, mode='TEST'))
    ious = per_gt_iou(jax.device_get(eval_step(variables, batch)), batch)
    print(f'{name}: loss {float(tb["loss"]):.3f} ({time.time() - t0:.0f}s), '
          f'per-gt IoU {[round(v, 3) for v in ious]} (min {min(ious):.3f})',
          flush=True)
    return variables, ious


def main():
    base = base_config()
    rng = np.random.RandomState(11 + int(os.environ.get('ABLATE_SEED', '0')))
    # batches must carry the ordering each policy expects
    batch_dense = synthetic_batch(rng, base, batch=2, structured=True)
    cfg_bl = base.merged({'RPN': {'BLOCK_LOCAL': True}})
    rng2 = np.random.RandomState(11 + int(os.environ.get('ABLATE_SEED', '0')))
    batch_bl = synthetic_batch(rng2, cfg_bl, batch=2, structured=True)

    dense_vars, _ = run('dense (nested approx)', base, batch_dense)
    run('block-local', cfg_bl, batch_bl)

    eval_step = make_joint_eval_step(cfg_bl, EPNet(cfg_bl, mode='TEST'))
    ious = per_gt_iou(jax.device_get(eval_step(dense_vars, batch_bl)),
                      batch_bl)
    print(f'dense-trained evaled block-local (swap hazard): per-gt IoU '
          f'{[round(v, 3) for v in ious]} (min {min(ious):.3f})', flush=True)


if __name__ == '__main__':
    main()
