"""Structured-scene overfit: train the tiny two-stage model on one fixed
batch of scenes with points ON the gt car surfaces and verify the full
inference path (backbone -> proposals -> rcnn -> decode -> NMS) localizes
EVERY gt car with real IoU (SURVEY.md §4 test pyramid (c); VERDICT r1 item
4a raised the bar from max-IoU>0.1 on uniform noise to per-gt IoU>0.6 here
— measured headroom: 0.80-0.93 per gt, proposals 0.91-0.99).

This bar is sharp: a half-height y-offset anywhere in the decode chain
caps 3D IoU at ~0.4 (it did, when the fixture mislabeled y at the box
bottom instead of the true vertical center) and starves the RCNN stage of
foreground rois entirely (proposal-gt IoU never reaches the 0.55 fg
threshold), which this test now also pins via tb['rcnn_reg_fg'] > 0.
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
@pytest.mark.parametrize('init_seed,data_seed', [(0, 11), (1, 12)])
def test_overfit_single_batch_structured(init_seed, data_seed):
    # LR 0.02 trains on the edge of stability (loss spikes to ~250 around
    # step 10) — the outcome then flips on fp-noise-level numerics changes
    # (tools/cmp_fused_head.py: fused vs dense heads diverge chaotically
    # from rel 2e-7 at step 0). 0.01 converges cleanly for both paths.
    # The trajectory is still chaotic: fp-noise-level numerics changes (or
    # a different XLA device-count flag) flip WHICH basin a fixed-step run
    # lands in, occasionally leaving one hard gt unlocalized at step 300
    # while the other five sit at IoU 0.85+. Evaluate at checkpoints and
    # train on if not yet converged (cap 900 steps): a genuine decode /
    # target-assignment bug keeps the bar unmet at every checkpoint
    # (tools/debug_overfit_gt.py aids diagnosis when this fails).
    #
    # VERDICT r2 weak-1 hardening: the checkpoint retry tolerates basin
    # chaos but would also tolerate a regression that merely raises the
    # basin-miss rate. Running TWO independent PRNG seeds and requiring
    # BOTH to clear the bar at some checkpoint restores that sensitivity
    # (a miss-rate jump from ~1/3 to ~2/3 per checkpoint fails the pair
    # with high probability while a healthy model still passes).
    cfg = tiny_config().merged({
        'TRAIN': {'LR': 0.01, 'RPN_PRE_NMS_TOP_N': 128, 'RPN_POST_NMS_TOP_N': 32},
        'RPN': {'DP_RATIO': 0.0},
    })
    rng = np.random.RandomState(data_seed)
    batch = synthetic_batch(rng, cfg, batch=2, structured=True)
    state, model, tx = create_train_state(cfg, jax.random.PRNGKey(init_seed),
                                          batch, total_steps=900)
    step = jit_train_step(cfg, model, tx)
    key = jax.random.PRNGKey(3)

    eval_model = EPNet(cfg, mode='TEST')
    eval_step = make_joint_eval_step(cfg, eval_model)

    def measure(state):
        variables = {'params': state.params, 'batch_stats': state.batch_stats}
        res = jax.device_get(eval_step(variables, batch))
        per_gt = []
        for b in range(2):
            gt = batch['gt_boxes3d'][b]
            order = np.argsort(-res['norm_scores'][b])
            top = res['pred_boxes3d'][b][order[:10]]
            iou = np.asarray(boxes_iou3d(jnp.asarray(top), jnp.asarray(gt)))
            per_gt.extend(iou.max(axis=0).tolist())  # best detection per gt
        return per_gt

    first_loss = last_loss = None
    per_gt = None
    for phase in range(3):
        for i in range(300):
            state, tb = step(state, batch, key, jnp.float32(0.1))
            if phase == 0 and i == 0:
                first_loss = float(tb['loss'])
            last_loss = float(tb['loss'])
        assert np.isfinite(last_loss)
        per_gt = measure(state)
        if min(per_gt) > 0.6:
            break
    assert last_loss < first_loss * 0.5, (first_loss, last_loss)
    # the RCNN stage must be training on real foreground rois
    assert float(tb['rcnn_reg_fg']) > 0, dict(tb)
    # inference: EVERY gt car must be localized by some top-10 detection
    assert min(per_gt) > 0.6, per_gt
    assert max(per_gt) > 0.8, per_gt
