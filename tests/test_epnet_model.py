"""Full two-stage EPNet smoke tests (tiny config, CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from epnet_tpu.models.epnet import EPNet

from tiny import synthetic_batch, tiny_config


@pytest.fixture(scope='module')
def setup():
    cfg = tiny_config()
    rng = np.random.RandomState(5)
    batch = synthetic_batch(rng, cfg, batch=2)
    model = EPNet(cfg, mode='TRAIN')
    variables = model.init(
        {'params': jax.random.PRNGKey(0), 'sampling': jax.random.PRNGKey(1),
         'dropout': jax.random.PRNGKey(2)},
        batch, train=True)
    return cfg, batch, model, variables


def test_train_forward_shapes(setup):
    cfg, batch, model, variables = setup
    out, _ = model.apply(
        variables, batch, train=True, mutable=['batch_stats'],
        rngs={'sampling': jax.random.PRNGKey(11), 'dropout': jax.random.PRNGKey(12)})
    B, N = batch['pts_input'].shape[:2]
    R = cfg.RCNN.ROI_PER_IMAGE
    assert out['rpn_cls'].shape == (B, N, 1)
    assert out['rois'].shape == (B, cfg.TRAIN.RPN_POST_NMS_TOP_N, 7)
    assert out['rcnn_cls'].shape == (B * R, 1)
    assert out['rcnn_reg'].shape == (B * R, cfg.RCNN.reg_channel)
    assert out['cls_label'].shape == (B * R,)
    assert out['gt_of_rois'].shape == (B * R, 7)
    assert np.isfinite(np.asarray(out['rcnn_reg'])).all()
    # labels are in {-1, 0, 1}
    lab = np.asarray(out['cls_label'])
    assert set(np.unique(lab)).issubset({-1, 0, 1})


def test_eval_forward_shapes(setup):
    cfg, batch, model, variables = setup
    eval_model = EPNet(cfg, mode='TEST')
    out = eval_model.apply(variables, batch, train=False)
    B = batch['pts_input'].shape[0]
    M = cfg.TEST.RPN_POST_NMS_TOP_N
    assert out['rois'].shape == (B, M, 7)
    assert out['rcnn_cls'].shape == (B * M, 1)
    assert np.isfinite(np.asarray(out['rcnn_cls'])).all()


def test_target_sampling_sane(setup):
    cfg, batch, model, variables = setup
    out, _ = model.apply(
        variables, batch, train=True, mutable=['batch_stats'],
        rngs={'sampling': jax.random.PRNGKey(3), 'dropout': jax.random.PRNGKey(4)})
    iou = np.asarray(out['gt_iou'])
    assert (iou >= -1e-6).all() and (iou <= 1 + 1e-6).all()
    rois = np.asarray(out['roi_boxes3d'])
    assert np.isfinite(rois).all()
    # canonical gt should be near the roi frame origin for fg rois
    fg = np.asarray(out['reg_valid_mask']) > 0
    if fg.any():
        gt_ct = np.asarray(out['gt_of_rois'])[fg]
        assert np.abs(gt_ct[:, [0, 2]]).max() < 5.0
