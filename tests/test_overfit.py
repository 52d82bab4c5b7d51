"""Synthetic-scene overfit: train the tiny two-stage model on one fixed
batch and verify the full inference path (backbone -> proposals -> rcnn ->
decode -> NMS) localizes the ground truth (SURVEY.md §4 test pyramid (c)).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from epnet_tpu.eval.detect import make_joint_eval_step
from epnet_tpu.models.epnet import EPNet
from epnet_tpu.ops.rotated_iou import boxes_iou3d
from epnet_tpu.train.trainer import create_train_state, jit_train_step

from tiny import synthetic_batch, tiny_config


@pytest.mark.slow
def test_overfit_single_batch():
    cfg = tiny_config().merged({
        'TRAIN': {'LR': 0.02, 'RPN_PRE_NMS_TOP_N': 128, 'RPN_POST_NMS_TOP_N': 32},
        'RPN': {'DP_RATIO': 0.0},
    })
    rng = np.random.RandomState(11)
    batch = synthetic_batch(rng, cfg, batch=2)
    # densify: put many points on each gt box so the detector has signal
    state, model, tx = create_train_state(cfg, jax.random.PRNGKey(0), batch,
                                          total_steps=150)
    step = jit_train_step(cfg, model, tx)
    key = jax.random.PRNGKey(3)
    first_loss = last_loss = None
    for i in range(150):
        state, tb = step(state, batch, key, jnp.float32(0.1))
        if i == 0:
            first_loss = float(tb['loss'])
        last_loss = float(tb['loss'])
    assert np.isfinite(last_loss)
    assert last_loss < first_loss * 0.7, (first_loss, last_loss)

    # inference: the best detections should overlap the gt
    eval_model = EPNet(cfg, mode='TEST')
    eval_step = make_joint_eval_step(cfg, eval_model)
    variables = {'params': state.params, 'batch_stats': state.batch_stats}
    res = jax.device_get(eval_step(variables, batch))
    got_iou = []
    for b in range(2):
        gt = batch['gt_boxes3d'][b]
        order = np.argsort(-res['norm_scores'][b])
        top = res['pred_boxes3d'][b][order[:10]]
        iou = np.asarray(boxes_iou3d(jnp.asarray(top), jnp.asarray(gt)))
        got_iou.append(iou.max())
    # the tiny random scene is hard; expect at least loose localization
    assert max(got_iou) > 0.1, got_iou
