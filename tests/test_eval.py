"""Evaluator tests: rotated IoU oracle cross-check, AP protocol sanity,
end-to-end joint eval on the synthetic KITTI set."""

import numpy as np
import pytest

from epnet_tpu.eval.kitti_ap import empty_anno, get_official_eval_result
from epnet_tpu.eval.rotate_iou_np import rotate_iou_bev


def center_to_bev5(cx, cy, dx, dy, ang):
    return np.array([[cx, cy, dx, dy, ang]], np.float64)


def test_rotate_iou_identical():
    a = center_to_bev5(1.0, 2.0, 4.0, 2.0, 0.5)
    iou = rotate_iou_bev(a, a)
    assert abs(iou[0, 0] - 1.0) < 1e-6


def test_rotate_iou_axis_aligned_known():
    a = center_to_bev5(0, 0, 2, 2, 0)
    b = center_to_bev5(1, 0, 2, 2, 0)
    iou = rotate_iou_bev(a, b)
    assert abs(iou[0, 0] - (2.0 / 6.0)) < 1e-6


def test_rotate_iou_matches_device_kernel():
    from epnet_tpu.ops.rotated_iou import rotated_overlap_bev

    rng = np.random.RandomState(0)
    n = 10
    cx, cy = rng.uniform(-5, 5, (2, n))
    dx, dy = rng.uniform(1, 4, (2, n))
    ang = rng.uniform(-np.pi, np.pi, n)
    center = np.stack([cx, cy, dx, dy, ang], axis=1)
    # device kernel takes corner-format [x1, y1, x2, y2, ang]
    corner = np.stack([cx - dx / 2, cy - dy / 2, cx + dx / 2, cy + dy / 2, ang], axis=1)
    ov_np = rotate_iou_bev(center, center, criterion=2)
    ov_dev = np.asarray(rotated_overlap_bev(corner.astype(np.float32),
                                            corner.astype(np.float32)))
    np.testing.assert_allclose(ov_np, ov_dev, atol=2e-2, rtol=1e-3)


def make_anno(boxes3d, names=None, scores=None, heights=60.0):
    """anno from (N, 7) [x, y, z, h, w, l, ry] rect boxes."""
    n = len(boxes3d)
    if n == 0:
        return empty_anno()
    bbox = np.zeros((n, 4))
    bbox[:, 2] = 100
    bbox[:, 3] = heights  # tall enough for 'easy'
    return {
        'name': np.array(names if names is not None else ['Car'] * n),
        'truncated': np.zeros(n), 'occluded': np.zeros(n, np.int64),
        'alpha': np.zeros(n), 'bbox': bbox,
        'dimensions': boxes3d[:, [5, 3, 4]],  # l, h, w
        'location': boxes3d[:, 0:3], 'rotation_y': boxes3d[:, 6],
        'score': np.asarray(scores if scores is not None else np.ones(n)),
    }


def random_boxes(rng, n):
    return np.stack([
        rng.uniform(-20, 20, n), rng.uniform(1, 2, n), rng.uniform(5, 60, n),
        rng.uniform(1.4, 1.7, n), rng.uniform(1.5, 1.7, n),
        rng.uniform(3.6, 4.2, n), rng.uniform(-np.pi, np.pi, n)], axis=1)


def test_ap_perfect_detections():
    # needs >= ~40 gt so the 41 recall sample points are all reachable
    rng = np.random.RandomState(1)
    gt, dt = [], []
    for _ in range(15):
        b = random_boxes(rng, 6)
        gt.append(make_anno(b))
        dt.append(make_anno(b, scores=rng.rand(6)))
    _, res = get_official_eval_result(gt, dt, 'Car')
    assert res['Car']['3d'][0] > 95.0
    assert res['Car']['bev'][0] > 95.0
    assert res['Car']['bbox'][0] > 95.0


def test_ap_no_detections():
    rng = np.random.RandomState(2)
    gt = [make_anno(random_boxes(rng, 3)) for _ in range(4)]
    dt = [empty_anno() for _ in range(4)]
    _, res = get_official_eval_result(gt, dt, 'Car')
    assert res['Car']['3d'][0] == 0.0


def test_ap_half_detections_between():
    rng = np.random.RandomState(3)
    gt, dt = [], []
    for _ in range(10):
        b = random_boxes(rng, 4)
        gt.append(make_anno(b))
        dt.append(make_anno(b[:2], scores=np.array([0.9, 0.8])))
    _, res = get_official_eval_result(gt, dt, 'Car')
    ap = res['Car']['3d'][0]
    assert 20.0 < ap < 80.0  # recall caps at 50%


def test_ap_false_positives_reduce_precision():
    rng = np.random.RandomState(4)
    gt, dt_clean, dt_noisy = [], [], []
    for _ in range(6):
        b = random_boxes(rng, 3)
        fp = random_boxes(rng, 3) + np.array([100, 0, 100, 0, 0, 0, 0])
        gt.append(make_anno(b))
        dt_clean.append(make_anno(b, scores=np.full(3, 0.9)))
        noisy = np.concatenate([b, fp], axis=0)
        dt_noisy.append(make_anno(noisy, scores=np.full(6, 0.9)))
    _, clean = get_official_eval_result(gt, dt_clean, 'Car')
    _, noisy = get_official_eval_result(gt, dt_noisy, 'Car')
    assert noisy['Car']['3d'][0] < clean['Car']['3d'][0]


def test_van_gt_is_ignored_not_fp():
    rng = np.random.RandomState(5)
    gt, dt_with_van, dt_clean = [], [], []
    for _ in range(12):
        cars = random_boxes(rng, 4)
        van = random_boxes(rng, 1)
        gt.append(make_anno(np.concatenate([cars, van]),
                            names=['Car'] * 4 + ['Van']))
        dt_clean.append(make_anno(cars, scores=rng.rand(4)))
        # detections on the van match an ignored gt -> must NOT count as FP
        dt_with_van.append(make_anno(np.concatenate([cars, van]),
                                     scores=np.concatenate([rng.rand(4), [0.99]])))
    _, clean = get_official_eval_result(gt, dt_clean, 'Car')
    _, withv = get_official_eval_result(gt, dt_with_van, 'Car')
    assert abs(clean['Car']['3d'][0] - withv['Car']['3d'][0]) < 1.0
    assert clean['Car']['3d'][0] > 90.0


def test_load_variables_on_labelless_batch(tmp_path):
    """Eval init must work on a TEST-split batch that carries NO gt fields
    (regression: create_train_state init'd with train=True, whose forward
    path reads batch['gt_boxes3d'] -> KeyError on `--test`)."""
    import jax
    import sys, os
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..', 'tools'))
    from eval import load_variables
    from tiny import synthetic_batch, tiny_config

    cfg = tiny_config()
    rng = np.random.RandomState(0)
    batch = synthetic_batch(rng, cfg, batch=1, with_gt=False)
    for k in ('gt_boxes3d', 'rpn_cls_label', 'rpn_reg_label'):
        assert k not in batch, k
    variables, epoch = load_variables(cfg, None, batch)
    assert epoch == 0
    assert 'params' in variables
    assert jax.tree_util.tree_leaves(variables['params'])
