"""People (3-class) path end-to-end on synthetic data: CrossEntropy RCNN
head with per-class weights (reference rcnn_net.py:45, lib/config.py
CLS_WEIGHT) trains and evaluates. NOTE: the reference's own multi-class
branch is unreachable as shipped (train_functions.py:236 reads an undefined
``rcnn_cls_flat`` when TRAIN.LOSS_CLS == 'CrossEntropy'); these tests pin
OUR completed semantics: CE with ignore -1 + class weights, objectness
1 - P(background)."""

import jax
import jax.numpy as jnp
import numpy as np

from epnet_tpu.train.loss import rcnn_loss

from tiny import synthetic_batch, tiny_config


def people_config(**over):
    return tiny_config().merged({
        'CLASSES': 'People',
        'RCNN': {'LOSS_CLS': 'CrossEntropy',
                 'CLS_WEIGHT': (1.0, 1.0, 1.0)},
        'TRAIN': {'LR': 0.02},
        'RPN': {'DP_RATIO': 0.0},
    }).merged(over)


def test_rcnn_head_emits_three_logits():
    cfg = people_config()
    assert cfg.num_classes == 3
    from epnet_tpu.models.rcnn import RCNNNet

    S = cfg.RCNN.NUM_POINTS
    ci = cfg.RCNN.input_channel
    pooled = jnp.asarray(np.random.RandomState(0).randn(4, S, ci + 32), jnp.float32)
    m = RCNNNet(cfg)
    v = m.init({'params': jax.random.PRNGKey(0), 'dropout': jax.random.PRNGKey(1)},
               pooled, train=False)
    out = m.apply(v, pooled, train=False)
    assert out['rcnn_cls'].shape == (4, 3)


def test_ce_loss_ignores_minus_one_and_weights_classes():
    cfg = people_config()
    rng = np.random.RandomState(1)
    n = 8
    out = {
        'rcnn_cls': jnp.asarray(rng.randn(n, 3), jnp.float32),
        'rcnn_reg': jnp.zeros((n, cfg.RCNN.reg_channel), jnp.float32),
        'cls_label': jnp.asarray([0, 1, 2, -1, 0, 1, 2, -1], jnp.float32),
        'reg_valid_mask': jnp.zeros((n,), jnp.int32),
        'gt_of_rois': jnp.zeros((n, 7), jnp.float32),
        'mask_score': jnp.ones((n,), jnp.float32),
    }
    loss, tb = rcnn_loss(cfg, out)
    assert np.isfinite(float(loss))

    # manual CE over the 6 valid rois
    logits = np.asarray(out['rcnn_cls'])
    logp = logits - np.log(np.exp(logits).sum(-1, keepdims=True))
    tgt = np.array([0, 1, 2, 0, 0, 1, 2, 0])
    valid = np.array([1, 1, 1, 0, 1, 1, 1, 0], float)
    per = -logp[np.arange(n), tgt]
    want = (per * valid).sum() / valid.sum()
    np.testing.assert_allclose(float(tb['rcnn_loss_cls']), want, rtol=1e-5)

    # class weights scale the per-class terms
    cfg_w = people_config(RCNN={'CLS_WEIGHT': (1.0, 10.0, 1.0)})
    loss_w, tb_w = rcnn_loss(cfg_w, out)
    w = np.array([1.0, 10.0, 1.0])[tgt]
    want_w = (per * w * valid).sum() / valid.sum()
    np.testing.assert_allclose(float(tb_w['rcnn_loss_cls']), want_w, rtol=1e-5)


def test_people_joint_train_and_eval_steps():
    """Full two-stage train step + joint eval with the 3-class head."""
    from epnet_tpu.eval.detect import make_joint_eval_step
    from epnet_tpu.models.epnet import EPNet
    from epnet_tpu.train.trainer import create_train_state, jit_train_step

    cfg = people_config(TRAIN={'RPN_PRE_NMS_TOP_N': 64, 'RPN_POST_NMS_TOP_N': 16})
    rng = np.random.RandomState(2)
    batch = synthetic_batch(rng, cfg, batch=2)
    state, model, tx = create_train_state(cfg, jax.random.PRNGKey(0), batch,
                                          total_steps=10)
    step = jit_train_step(cfg, model, tx)
    key = jax.random.PRNGKey(3)
    losses = []
    for _ in range(3):
        state, tb = step(state, batch, key, jnp.float32(0.1))
        losses.append(float(tb['loss']))
    assert all(np.isfinite(l) for l in losses), losses

    eval_model = EPNet(cfg, mode='TEST')
    eval_step = make_joint_eval_step(cfg, eval_model)
    variables = {'params': state.params, 'batch_stats': state.batch_stats}
    res = jax.device_get(eval_step(variables, batch))
    M = cfg.TEST.RPN_POST_NMS_TOP_N
    assert res['pred_boxes3d'].shape == (2, M, 7)
    assert res['norm_scores'].shape == (2, M)
    assert np.isfinite(res['norm_scores']).all()
    assert (res['norm_scores'] >= 0).all() and (res['norm_scores'] <= 1).all()
