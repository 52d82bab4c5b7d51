"""Why does one synthetic gt miss in the structured overfit?

Trains the overfit recipe, then reports per-gt: points inside the box,
best proposal IoU (RPN stage), best final-detection IoU, and the scores
of the detections nearest it.
"""
import os
import sys

os.environ.setdefault('XLA_FLAGS', '--xla_force_host_platform_device_count=1')
import jax

jax.config.update('jax_platforms', 'cpu')
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), 'tests'))

import jax.numpy as jnp
import numpy as np

from tiny import synthetic_batch, tiny_config
from epnet_tpu.eval.detect import make_joint_eval_step
from epnet_tpu.models.epnet import EPNet
from epnet_tpu.ops.rotated_iou import boxes_iou3d
from epnet_tpu.data.box_np import points_in_boxes3d
from epnet_tpu.train.trainer import create_train_state, jit_train_step


def main():
    cfg = tiny_config().merged({
        'TRAIN': {'LR': 0.01, 'RPN_PRE_NMS_TOP_N': 128,
                  'RPN_POST_NMS_TOP_N': 32},
        'RPN': {'DP_RATIO': 0.0}})
    rng = np.random.RandomState(11)
    batch = synthetic_batch(rng, cfg, batch=2, structured=True)
    state, model, tx = create_train_state(cfg, jax.random.PRNGKey(0), batch,
                                          total_steps=300)
    step = jit_train_step(cfg, model, tx)
    key = jax.random.PRNGKey(3)
    for i in range(300):
        state, tb = step(state, batch, key, jnp.float32(0.1))
    print('final loss', float(tb['loss']), flush=True)

    eval_model = EPNet(cfg, mode='TEST')
    eval_step = make_joint_eval_step(cfg, eval_model)
    variables = {'params': state.params, 'batch_stats': state.batch_stats}
    res = jax.device_get(eval_step(variables, batch))
    for b in range(2):
        gt = batch['gt_boxes3d'][b]
        pts = batch['pts_input'][b][:, :3]
        inside = points_in_boxes3d(pts, gt)
        rois = res['rois'][b] if 'rois' in res else None
        det = res['pred_boxes3d'][b]
        scores = res['norm_scores'][b]
        order = np.argsort(-scores)
        top = det[order[:10]]
        iou_det = np.asarray(boxes_iou3d(jnp.asarray(top), jnp.asarray(gt)))
        for g in range(gt.shape[0]):
            npts = int(inside[:, g].sum()) if inside.ndim == 2 else -1
            best_det = float(iou_det[:, g].max())
            line = (f'b{b} gt{g}: center=({gt[g,0]:.1f},{gt[g,1]:.1f},'
                    f'{gt[g,2]:.1f}) hwl=({gt[g,3]:.2f},{gt[g,4]:.2f},'
                    f'{gt[g,5]:.2f}) pts_in={npts} det_iou={best_det:.3f}')
            if rois is not None:
                iou_roi = np.asarray(boxes_iou3d(
                    jnp.asarray(rois[b] if rois.ndim == 3 else rois),
                    jnp.asarray(gt[g:g + 1])))
                line += f' best_roi_iou={float(iou_roi.max()):.3f}'
            print(line, flush=True)
        # gt-gt overlaps (cars colliding?)
        gg = np.array(boxes_iou3d(jnp.asarray(gt), jnp.asarray(gt)))
        np.fill_diagonal(gg, 0)
        print(f'b{b} max gt-gt IoU: {gg.max():.3f}', flush=True)


if __name__ == '__main__':
    main()
