"""Golden tests for the bin-based codec and losses.

Strategy (SURVEY.md §4 implication (b)): construct predictions that encode a
known box exactly, then check encode->decode roundtrips and loss values
against hand-derivable numbers.
"""

import math

import numpy as np
import pytest

from epnet_tpu.losses import (
    binary_cross_entropy,
    dice_loss,
    get_reg_loss,
    sigmoid_focal_loss,
    smooth_l1,
)
from epnet_tpu.ops.bbox_codec import decode_bbox_target, encode_targets

PI = math.pi


def perfect_pred_reg(gt_offsets, anchor, loc_scope, loc_bin_size, num_head_bin,
                     get_ry_fine=False, sharp=40.0):
    """Build a (N, C) pred_reg whose argmax-decode reproduces gt_offsets."""
    n_bin = int(loc_scope / loc_bin_size) * 2
    t = encode_targets(gt_offsets, anchor, loc_scope, loc_bin_size, num_head_bin,
                       get_ry_fine=get_ry_fine)
    t = {k: np.asarray(v) for k, v in zip(t._fields, t)}
    N = gt_offsets.shape[0]
    C = n_bin * 4 + num_head_bin * 2 + 3 + 1
    reg = np.zeros((N, C), dtype=np.float32)
    r = np.arange(N)
    reg[r, t['x_bin']] = sharp
    reg[r, n_bin + t['z_bin']] = sharp
    reg[r, 2 * n_bin + t['x_bin']] = t['x_res_norm']
    reg[r, 3 * n_bin + t['z_bin']] = t['z_res_norm']
    reg[:, 4 * n_bin] = t['y_offset']
    reg[r, 4 * n_bin + 1 + t['ry_bin']] = sharp
    reg[r, 4 * n_bin + 1 + num_head_bin + t['ry_bin']] = t['ry_res_norm']
    reg[:, -3:] = t['size_res_norm']
    return reg


@pytest.fixture(scope='module')
def rng():
    return np.random.RandomState(7)


def make_gt(rng, n, loc_scope=3.0, ry_range=PI):
    return np.stack([
        rng.uniform(-loc_scope + 0.1, loc_scope - 0.1, n),
        rng.uniform(-0.5, 0.5, n),
        rng.uniform(-loc_scope + 0.1, loc_scope - 0.1, n),
        rng.uniform(1.3, 1.8, n),
        rng.uniform(1.4, 1.8, n),
        rng.uniform(3.2, 4.4, n),
        rng.uniform(-ry_range, ry_range, n),
    ], axis=1).astype(np.float32)


ANCHOR = np.array([1.52, 1.63, 3.88], dtype=np.float32)


def test_rpn_roundtrip_argmax(rng):
    gt = make_gt(rng, 64)
    reg = perfect_pred_reg(gt, ANCHOR, 3.0, 0.5, 12, get_ry_fine=False)
    anchors_xyz = rng.uniform(-10, 10, (64, 3)).astype(np.float32)
    # gt offsets are relative to the anchor point
    decoded = np.asarray(decode_bbox_target(
        anchors_xyz, reg, ANCHOR, 3.0, 0.5, 12,
        get_xz_fine=True, get_ry_fine=False, bbox_avg_by_bin=False))
    np.testing.assert_allclose(decoded[:, 0], gt[:, 0] + anchors_xyz[:, 0], atol=1e-3)
    np.testing.assert_allclose(decoded[:, 1], gt[:, 1] + anchors_xyz[:, 1], atol=1e-3)
    np.testing.assert_allclose(decoded[:, 2], gt[:, 2] + anchors_xyz[:, 2], atol=1e-3)
    np.testing.assert_allclose(decoded[:, 3:6], gt[:, 3:6], atol=1e-3)
    # heading is recovered mod 2*pi into (-pi, pi]
    d = (decoded[:, 6] - gt[:, 6] + PI) % (2 * PI) - PI
    np.testing.assert_allclose(d, 0, atol=1e-3)


def test_rpn_roundtrip_soft_bin(rng):
    # with very sharp bin logits the soft expectation converges to argmax
    gt = make_gt(rng, 32)
    reg = perfect_pred_reg(gt, ANCHOR, 3.0, 0.5, 12, sharp=80.0)
    anchors_xyz = np.zeros((32, 3), dtype=np.float32)
    decoded = np.asarray(decode_bbox_target(
        anchors_xyz, reg, ANCHOR, 3.0, 0.5, 12,
        get_xz_fine=True, get_ry_fine=False, bbox_avg_by_bin=True))
    np.testing.assert_allclose(decoded[:, 0], gt[:, 0], atol=1e-2)
    np.testing.assert_allclose(decoded[:, 2], gt[:, 2], atol=1e-2)


def test_rcnn_roundtrip_with_roi_rotation(rng):
    n = 48
    gt_ct = make_gt(rng, n, loc_scope=1.5, ry_range=PI / 5)  # canonical-frame gt
    reg = perfect_pred_reg(gt_ct, ANCHOR, 1.5, 0.5, 9, get_ry_fine=True)
    rois = np.stack([
        rng.uniform(-20, 20, n), rng.uniform(-1, 2, n), rng.uniform(5, 60, n),
        rng.uniform(1.4, 1.7, n), rng.uniform(1.5, 1.7, n), rng.uniform(3.5, 4.2, n),
        rng.uniform(-PI, PI, n)], axis=1).astype(np.float32)
    decoded = np.asarray(decode_bbox_target(
        rois, reg, ANCHOR, 1.5, 0.5, 9,
        get_xz_fine=True, get_ry_fine=True, bbox_avg_by_bin=False))
    # manual reconstruction: rotate canonical center by -roi_ry, add roi center
    c, s = np.cos(-rois[:, 6]), np.sin(-rois[:, 6])
    gx = c * gt_ct[:, 0] - s * gt_ct[:, 2] + rois[:, 0]
    gz = s * gt_ct[:, 0] + c * gt_ct[:, 2] + rois[:, 2]
    np.testing.assert_allclose(decoded[:, 0], gx, atol=2e-3)
    np.testing.assert_allclose(decoded[:, 2], gz, atol=2e-3)
    np.testing.assert_allclose(decoded[:, 1], gt_ct[:, 1] + rois[:, 1], atol=1e-3)
    d = (decoded[:, 6] - (gt_ct[:, 6] + rois[:, 6]) + PI) % (2 * PI) - PI
    np.testing.assert_allclose(d, 0, atol=2e-3)


def test_dice_loss_hand_value():
    # logits -> sigmoid 0.5 each; target [1, 0]; min-sum=0.5, max-sum=1.5
    logits = np.zeros(2, dtype=np.float32)
    target = np.array([1.0, 0.0], dtype=np.float32)
    got = float(dice_loss(logits, target))
    assert abs(got - (1.0 - 0.5 / 1.5)) < 1e-6


def test_dice_loss_ignores_minus_one():
    logits = np.array([10.0, -10.0, 0.0], dtype=np.float32)
    target = np.array([1.0, 0.0, -1.0], dtype=np.float32)
    got = float(dice_loss(logits, target))
    assert got < 1e-3  # the ignored element contributes nothing


def test_focal_loss_matches_formula(rng):
    logits = rng.randn(16).astype(np.float32)
    targets = (rng.rand(16) > 0.5).astype(np.float32)
    w = np.ones(16, dtype=np.float32)
    got = np.asarray(sigmoid_focal_loss(logits, targets, w, gamma=2.0, alpha=0.25))
    p = 1 / (1 + np.exp(-logits))
    ce = -(targets * np.log(p) + (1 - targets) * np.log(1 - p))
    pt = targets * p + (1 - targets) * (1 - p)
    aw = targets * 0.25 + (1 - targets) * 0.75
    want = ((1 - pt) ** 2) * aw * ce
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_smooth_l1_matches_torch(rng):
    import torch
    a = rng.randn(50).astype(np.float32) * 2
    b = rng.randn(50).astype(np.float32)
    got = np.asarray(smooth_l1(a, b))
    want = torch.nn.functional.smooth_l1_loss(
        torch.from_numpy(a), torch.from_numpy(b), reduction='none').numpy()
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_bce_matches_torch(rng):
    import torch
    p = rng.rand(50).astype(np.float32)
    t = (rng.rand(50) > 0.5).astype(np.float32)
    got = np.asarray(binary_cross_entropy(p, t))
    want = torch.nn.functional.binary_cross_entropy(
        torch.from_numpy(p), torch.from_numpy(t), reduction='none').numpy()
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


def test_reg_loss_perfect_prediction_near_zero(rng):
    gt = make_gt(rng, 32)
    reg = perfect_pred_reg(gt, ANCHOR, 3.0, 0.5, 12)
    fg = np.ones(32, dtype=np.float32)
    cls_score = np.full(32, 0.9, dtype=np.float32)
    loc, angle, size, iou, d = get_reg_loss(
        cls_score, cls_score, reg, gt, fg,
        loc_scope=3.0, loc_bin_size=0.5, num_head_bin=12, anchor_size=ANCHOR,
        get_xz_fine=True, use_cls_score=True, iou_loss_type='cls_mask_with_bin')
    # bin CE with sharp logits ~ 0; residuals exact -> smooth-l1 ~ 0
    assert float(loc) < 1e-3
    assert float(angle) < 1e-3
    assert float(size) < 1e-6
    # IoU == 1 with perfect boxes, so CE loss = -log(0.9 * 1)
    assert abs(float(iou) - (-math.log(0.9))) < 2e-2


def test_reg_loss_empty_fg_is_zero(rng):
    gt = make_gt(rng, 8)
    reg = rng.randn(8, 12 * 4 + 12 * 2 + 4).astype(np.float32)
    fg = np.zeros(8, dtype=np.float32)
    loc, angle, size, iou, _ = get_reg_loss(
        fg, fg, reg, gt, fg, loc_scope=3.0, loc_bin_size=0.5, num_head_bin=12,
        anchor_size=ANCHOR, get_xz_fine=True, iou_loss_type='raw')
    assert float(loc) == 0 and float(angle) == 0 and float(size) == 0 and float(iou) == 0
