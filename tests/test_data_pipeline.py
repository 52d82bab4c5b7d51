"""Data pipeline tests on a synthetic on-disk KITTI mini-dataset."""

import numpy as np
import pytest

from epnet_tpu.data import box_np
from epnet_tpu.data.kitti_rcnn_dataset import KittiRCNNDataset, interpolate_img_by_xy
from epnet_tpu.data.loader import DataLoader

from tiny import tiny_config
from epnet_tpu.utils.testing import make_fake_kitti


@pytest.fixture(scope='module')
def kitti_root(tmp_path_factory):
    root = tmp_path_factory.mktemp('kitti')
    make_fake_kitti(str(root), n_samples=4)
    return str(root)


@pytest.fixture(scope='module')
def dataset(kitti_root):
    cfg = tiny_config()
    np.random.seed(0)
    return KittiRCNNDataset(kitti_root, cfg, npoints=cfg.RPN.NUM_POINTS,
                            split='train', classes='Car', mode='TRAIN', max_gt=10)


def test_sample_shapes(dataset):
    cfg = dataset.cfg
    s = dataset[0]
    N = cfg.RPN.NUM_POINTS
    assert s['pts_input'].shape == (N, 3)  # USE_INTENSITY False in tiny cfg
    assert s['img'].shape == (384, 1280, 3)
    assert s['pts_origin_xy'].shape == (N, 2)
    assert s['rpn_cls_label'].shape == (N,)
    assert s['rpn_reg_label'].shape == (N, 7)
    assert s['gt_boxes3d'].shape[1] == 7 and len(s['gt_boxes3d']) >= 1
    # projected coords must be inside the padded image
    assert (s['pts_origin_xy'][:, 0] >= 0).all() and (s['pts_origin_xy'][:, 0] < 1280).all()
    assert (s['pts_origin_xy'][:, 1] >= 0).all() and (s['pts_origin_xy'][:, 1] < 384).all()


def test_labels_consistent_with_boxes(dataset):
    s = dataset[1]
    pts, gt = s['pts_rect'], s['gt_boxes3d']
    inb = box_np.points_in_boxes3d(pts, gt).any(axis=0)
    cls = s['rpn_cls_label']
    # every in-box point is labeled fg
    assert (cls[inb] == 1).all()
    # fg points carry the assigned box's size in the reg label
    fg = cls == 1
    if fg.any():
        assert (s['rpn_reg_label'][fg, 3] > 0).all()
        # offsets point to a box center: |dx|,|dz| bounded by box extent
        assert np.abs(s['rpn_reg_label'][fg, 0]).max() < 6


def test_eval_mode_sample(kitti_root):
    cfg = tiny_config()
    ds = KittiRCNNDataset(kitti_root, cfg, npoints=cfg.RPN.NUM_POINTS,
                          split='val', classes='Car', mode='EVAL', max_gt=10)
    s = ds[0]
    assert 'rpn_cls_label' in s and 'gt_boxes3d' in s


def test_collate_fixed_shapes(dataset):
    batch = dataset.collate_batch([dataset[0], dataset[1]])
    assert batch['gt_boxes3d'].shape == (2, 10, 7)  # fixed max_gt, not ragged
    assert batch['pts_input'].shape[0] == 2
    assert batch['img'].shape == (2, 384, 1280, 3)


def test_loader_workers(dataset):
    loader = DataLoader(dataset, batch_size=2, shuffle=True, num_workers=2)
    batches = list(loader)
    assert len(batches) == 2
    for b in batches:
        assert b['pts_input'].shape[0] == 2
    loader.close()


def test_interpolate_img_by_xy_hand_value():
    # mirrors the reference __main__ smoke check (kitti_rcnn_dataset.py:1328-1334)
    img = np.array([0, 0, 0, 0, 5, 2.0]).reshape(3, 2, 1)
    xy = np.array([[0.5, 2.0]])  # x=0.5, y=2 -> between img[2,0]=5 and img[2,1]=2
    out = interpolate_img_by_xy(img, xy, np.array([3.0, 2.0]))
    assert abs(out[0, 0] - 3.5) < 1e-6


def test_scene_augmentation_keeps_points_on_boxes(dataset):
    np.random.seed(3)
    pts = np.random.randn(100, 3).astype(np.float32) * 5
    gt = np.array([[0, 1.5, 20, 1.5, 1.6, 3.9, 0.3]], np.float32)
    alpha_beta = np.arctan2(gt[0, 2], gt[0, 0])
    alpha = np.array([-np.sign(alpha_beta) * np.pi / 2 + alpha_beta + gt[0, 6]],
                     np.float32)
    inb_before = box_np.points_in_boxes3d(pts, gt)[0]
    p2, g2, _ = dataset.data_augmentation(pts.copy(), gt.copy(), alpha, mustaug=True)
    inb_after = box_np.points_in_boxes3d(p2, g2)[0]
    # rigid transforms preserve membership (scaling scales both)
    np.testing.assert_array_equal(inb_before, inb_after)
