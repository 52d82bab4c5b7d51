"""rcnn_offline eval: proposals + dumped features -> refine -> AP."""

import os

import jax
import numpy as np
import pytest

from epnet_tpu.data import DataLoader, KittiRCNNDataset
from epnet_tpu.eval.rcnn_offline_eval import evaluate_rcnn_offline
from epnet_tpu.eval.rpn_eval import evaluate_rpn
from epnet_tpu.train.trainer import create_train_state
from epnet_tpu.utils.testing import make_fake_kitti

from tiny import tiny_config


def test_rcnn_offline_eval_end_to_end(tmp_path):
    root = str(tmp_path / 'kitti')
    make_fake_kitti(root, n_samples=2)
    np.random.seed(0)

    # phase 1: dump rpn features + proposals
    cfg1 = tiny_config(rcnn=False)
    ds1 = KittiRCNNDataset(root, cfg1, npoints=cfg1.RPN.NUM_POINTS,
                           split='val', classes='Car', mode='EVAL', max_gt=8)
    loader = DataLoader(ds1, batch_size=2, shuffle=False, num_workers=0)
    batch = next(iter(loader))
    state, _, _ = create_train_state(cfg1, jax.random.PRNGKey(0), batch, 2)
    variables = {'params': state.params, 'batch_stats': state.batch_stats}
    dump_dir = str(tmp_path / 'dump')
    evaluate_rpn(cfg1, variables, ds1, loader, dump_dir, save_rpn_feature=True)

    # phase 2: rcnn-only eval from the dumps
    cfg2 = tiny_config(rcnn=True).merged({
        'RPN': {'ENABLED': False},
        'RCNN': {'ENABLED': True, 'ROI_SAMPLE_JIT': False}})
    ds2 = KittiRCNNDataset(
        root, cfg2, split='val', classes='Car', mode='EVAL', max_gt=8,
        rcnn_eval_roi_dir=os.path.join(dump_dir, 'roi_result', 'data'),
        rcnn_eval_feature_dir=os.path.join(dump_dir, 'features'))
    state2, _, _ = create_train_state(
        cfg2, jax.random.PRNGKey(1),
        ds2.collate_batch([ds2[0]]), 2)
    variables2 = {'params': state2.params, 'batch_stats': state2.batch_stats}
    ret = evaluate_rcnn_offline(cfg2, variables2, ds2,
                                str(tmp_path / 'results'), run_ap=True)
    assert 'ap' in ret and 'Car' in ret['ap']
    files = os.listdir(str(tmp_path / 'results' / 'final_result' / 'data'))
    assert len(files) == 2
