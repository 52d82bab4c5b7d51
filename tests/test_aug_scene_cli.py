"""End-to-end offline augmentation chain on a synthetic KITTI tree:

``generate_gt_database`` -> ``generate_aug_scene`` -> ``KittiRCNNDataset``
on the ``train_aug`` split (reference flow: tools/generate_gt_database.py +
tools/generate_aug_scene.py + lib/datasets/kitti_rcnn_dataset.py aug-id
routing, README recipe step 2).
"""

import os
import pickle
import sys

import numpy as np
import pytest

from tiny import tiny_config
from epnet_tpu.utils.testing import make_fake_kitti


@pytest.fixture(scope='module')
def aug_tree(tmp_path_factory):
    root = str(tmp_path_factory.mktemp('kitti_aug'))
    make_fake_kitti(root, n_samples=3)
    db_dir = os.path.join(root, 'gt_database')

    import tools.generate_gt_database as gdb
    argv = sys.argv
    sys.argv = ['generate_gt_database', '--data_root', root,
                '--split', 'train', '--classes', 'Car', '--save_dir', db_dir]
    try:
        gdb.main()
    finally:
        sys.argv = argv

    db_path = os.path.join(db_dir, 'train_gt_database.pkl')

    import tools.generate_aug_scene as gas
    sys.argv = ['generate_aug_scene', '--data_root', root,
                '--split', 'train', '--classes', 'Car',
                '--gt_database', db_path, '--aug_times', '1',
                '--extra_num', '2', '--seed', '7']
    try:
        gas.main()
    finally:
        sys.argv = argv
    return root, db_path


def test_gt_database_contents(aug_tree):
    _, db_path = aug_tree
    with open(db_path, 'rb') as f:
        db = pickle.load(f)
    assert len(db) >= 1
    for entry in db:
        assert entry['points'].shape[1] == 3
        assert entry['intensity'].shape[0] == entry['points'].shape[0]
        assert entry['gt_box3d'].shape == (7,)
        # cropped cluster must actually sit inside its box (loose: centroid)
        c = entry['points'].mean(0)
        assert np.linalg.norm(c[[0, 2]] - entry['gt_box3d'][[0, 2]]) < 4.0


def test_aug_outputs_on_disk(aug_tree):
    root, _ = aug_tree
    split_path = os.path.join(root, 'KITTI', 'ImageSets', 'train_aug.txt')
    assert os.path.exists(split_path)
    ids = [int(line) for line in open(split_path)]
    orig = [i for i in ids if i < 10000]
    aug = [i for i in ids if i >= 10000]
    assert orig == [0, 1, 2]
    assert len(aug) >= 1, 'no scene accepted the gt paste'
    scene_root = os.path.join(root, 'KITTI', 'aug_scene', 'training')
    for nid in aug:
        bin_path = os.path.join(scene_root, 'rectified_data', '%06d.bin' % nid)
        lbl_path = os.path.join(scene_root, 'aug_label', '%06d.txt' % nid)
        assert os.path.exists(bin_path) and os.path.exists(lbl_path)
        pts = np.fromfile(bin_path, np.float32).reshape(-1, 4)
        assert len(pts) > 1000
        # aug label must contain at least as many objects as the original
        n_orig = len(open(os.path.join(root, 'KITTI', 'object', 'training',
                                       'label_2', '%06d.txt' % (nid % 10000))
                          ).readlines())
        assert len(open(lbl_path).readlines()) >= n_orig


def test_train_aug_dataset_samples(aug_tree):
    root, _ = aug_tree
    from epnet_tpu.data.kitti_rcnn_dataset import KittiRCNNDataset
    # train_aug is LiDAR-only by design: pasted clusters have no aligned
    # image pixels (reference kitti_rcnn_dataset.py:294 asserts likewise)
    cfg = tiny_config().merged({'LI_FUSION': {'ENABLED': False}})
    np.random.seed(0)
    ds = KittiRCNNDataset(root, cfg, npoints=cfg.RPN.NUM_POINTS,
                          split='train_aug', classes='Car', mode='TRAIN',
                          max_gt=10)
    aug_positions = [k for k, sid in enumerate(ds.sample_id_list)
                     if sid >= 10000]
    assert aug_positions, 'train_aug split lost its augmented ids'
    N = cfg.RPN.NUM_POINTS
    for k in [0, aug_positions[0]]:
        s = ds[k]
        assert s['pts_input'].shape == (N, 3)
        assert s['rpn_cls_label'].shape == (N,)
        assert len(s['gt_boxes3d']) >= 1
        assert np.isfinite(s['pts_input']).all()
    # the augmented scene must carry at least one foreground point
    s = ds[aug_positions[0]]
    assert (s['rpn_cls_label'] > 0).sum() > 0
