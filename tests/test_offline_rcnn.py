"""Offline two-phase flow: rpn feature dump -> host roi sampling/pooling ->
rcnn_offline training step (SURVEY.md §3.5)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from epnet_tpu.data import DataLoader, KittiRCNNDataset
from epnet_tpu.eval.rpn_eval import evaluate_rpn
from epnet_tpu.train.trainer import create_train_state, device_batch, jit_train_step
from epnet_tpu.utils.testing import make_fake_kitti

from tiny import tiny_config


@pytest.fixture(scope='module')
def dumped(tmp_path_factory):
    root = tmp_path_factory.mktemp('kitti_off')
    make_fake_kitti(str(root), n_samples=2)
    cfg = tiny_config(rcnn=False)
    np.random.seed(0)
    ds = KittiRCNNDataset(str(root), cfg, npoints=cfg.RPN.NUM_POINTS,
                          split='val', classes='Car', mode='EVAL', max_gt=8)
    loader = DataLoader(ds, batch_size=2, shuffle=False, num_workers=0)
    batch = next(iter(loader))
    state, model, tx = create_train_state(cfg, jax.random.PRNGKey(0),
                                          batch, total_steps=2)
    variables = {'params': state.params, 'batch_stats': state.batch_stats}
    result_dir = str(tmp_path_factory.mktemp('rpn_dump'))
    ret = evaluate_rpn(cfg, variables, ds, loader, result_dir,
                       save_rpn_feature=True)
    return root, cfg, result_dir, ret


def test_rpn_eval_metrics_and_dump(dumped):
    root, cfg, result_dir, ret = dumped
    assert 'seg_iou' in ret and np.isfinite(ret['seg_iou'])
    assert 'rpn_recall(thresh=0.50)' in ret
    feat_dir = os.path.join(result_dir, 'features')
    for sid in (0, 1):
        for suffix in ('', '_xyz', '_intensity', '_seg', '_rawscore'):
            assert os.path.exists(os.path.join(feat_dir, f'{sid:06d}{suffix}.npy'))
    assert os.path.exists(os.path.join(result_dir, 'roi_result', 'data', '000000.txt'))


def test_offline_rcnn_training_sample(dumped):
    root, cfg, result_dir, _ = dumped
    cfg2 = tiny_config(rcnn=True).merged({
        'RPN': {'ENABLED': False},
        'RCNN': {'ENABLED': True, 'ROI_SAMPLE_JIT': False}})
    np.random.seed(1)
    ds = KittiRCNNDataset(
        str(root), cfg2, split='val', classes='Car', mode='TRAIN', max_gt=8,
        rcnn_training_roi_dir=os.path.join(result_dir, 'roi_result', 'data'),
        rcnn_training_feature_dir=os.path.join(result_dir, 'features'))
    s = ds[0]
    R, S = cfg2.RCNN.ROI_PER_IMAGE, cfg2.RCNN.NUM_POINTS
    C = cfg2.RCNN.input_channel + cfg2.RPN.FP_MLPS[0][-1]
    assert s['pts_input'].shape == (R, S, C)
    assert s['cls_label'].shape == (R,)
    assert set(np.unique(s['cls_label'])).issubset({-1, 0, 1})
    assert s['gt_boxes3d_ct'].shape == (R, 7)

    # one rcnn_offline train step end-to-end
    loader = DataLoader(ds, batch_size=2, shuffle=False, num_workers=0)
    batch = next(iter(loader))
    state, model, tx = create_train_state(cfg2, jax.random.PRNGKey(0),
                                          batch, total_steps=2)
    step = jit_train_step(cfg2, model, tx)
    state, tb = step(state, device_batch(batch), jax.random.PRNGKey(1),
                     jnp.float32(0.1))
    assert np.isfinite(float(tb['loss']))
    assert 'rcnn_loss' in tb and 'rpn_loss' not in tb
