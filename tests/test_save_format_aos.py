"""KITTI devkit-consistency checks for the detection dump + AOS metric.

Covers the reference's save_kitti_format (eval_rcnn.py:76-101) field order
and alpha convention (devkit: alpha = ry - arctan2(x, z)), round-trip
through our own parser, and hand-valued AOS scenarios for the evaluator
(eval.py compute_aos path: similarity = (1 + cos(d_alpha)) / 2).
"""

import os

import numpy as np

from epnet_tpu.data.calibration import Calibration
from epnet_tpu.eval.kitti_ap import eval_class, map_r40
from epnet_tpu.eval.kitti_common import parse_label_file, save_kitti_format

from test_eval_scenarios import grid_boxes, make_anno


def _calib():
    P2 = np.array([[700.0, 0, 620, 44.8],
                   [0, 700.0, 190, 0.1],
                   [0, 0, 1, 0.003]], np.float64)
    return Calibration({'P2': P2, 'R0': np.eye(3),
                        'Tr_velo2cam': np.eye(3, 4)})


def test_save_format_devkit_fields(tmp_path):
    boxes = np.array([[1.5, 1.6, 20.0, 1.52, 1.63, 3.88, 0.3],
                      [-3.0, 1.7, 35.0, 1.50, 1.60, 3.90, -1.2]], np.float32)
    scores = np.array([0.91, 0.42], np.float32)
    save_kitti_format(str(tmp_path), 7, _calib(), boxes, scores, (384, 1280))

    path = os.path.join(str(tmp_path), '000007.txt')
    lines = open(path).read().strip().split('\n')
    assert len(lines) == 2
    for k, line in enumerate(lines):
        f = line.split(' ')
        # devkit label: type trunc occl alpha bbox(4) hwl(3) xyz(3) ry score
        assert len(f) == 16
        assert f[0] == 'Car' and f[1] == '-1' and f[2] == '-1'
        vals = np.array(f[3:], np.float64)
        alpha, bbox, hwl, xyz, ry, score = (vals[0], vals[1:5], vals[5:8],
                                            vals[8:11], vals[11], vals[12])
        assert np.allclose(hwl, boxes[k, 3:6], atol=1e-4)
        assert np.allclose(xyz, boxes[k, 0:3], atol=1e-4)
        assert abs(ry - boxes[k, 6]) < 1e-4
        assert abs(score - scores[k]) < 1e-4
        # devkit observation-angle convention, modulo 2*pi
        want = boxes[k, 6] - np.arctan2(boxes[k, 0], boxes[k, 2])
        d = (alpha - want) % (2 * np.pi)
        assert min(d, 2 * np.pi - d) < 1e-3
        # 2D box inside the image, from projected 3D corners
        assert 0 <= bbox[0] < bbox[2] <= 1279 and 0 <= bbox[1] < bbox[3] <= 383

    # round-trips through our own annotation parser
    anno = parse_label_file(path)
    assert list(anno['name']) == ['Car', 'Car']
    assert np.allclose(anno['location'], boxes[:, 0:3], atol=1e-4)
    assert np.allclose(anno['score'], scores, atol=1e-4)


def test_save_format_drops_oversized_2d_boxes(tmp_path):
    # a box ~1m in front of the camera projects to >80% of the image
    boxes = np.array([[0.0, 1.6, 1.2, 1.52, 1.63, 3.88, 0.0]], np.float32)
    save_kitti_format(str(tmp_path), 3, _calib(), boxes,
                      np.array([0.9], np.float32), (384, 1280))
    assert open(os.path.join(str(tmp_path), '000003.txt')).read() == ''


def _with_alpha(anno, alpha):
    anno = dict(anno)
    anno['alpha'] = np.asarray(alpha, float)
    return anno


def test_aos_perfect_heading_equals_ap():
    G = 200
    rng = np.random.RandomState(2)
    boxes = grid_boxes(G)
    alphas = rng.uniform(-np.pi, np.pi, G)
    gt = [_with_alpha(make_anno(boxes), alphas)]
    dt = [_with_alpha(make_anno(boxes, scores=rng.permutation(G) / G + 0.5),
                      alphas)]
    r = eval_class(gt, dt, 'car', 0, 0, 0.7, compute_aos=True)
    assert abs(map_r40(r['precision']) - 100.0) < 1e-9
    assert abs(map_r40(r['aos']) - 100.0) < 1e-9


def test_aos_opposite_heading_is_zero_while_ap_stays_100():
    """alpha off by pi on every match: similarity (1+cos(pi))/2 = 0 exactly,
    but the boxes still match spatially so AP is unaffected."""
    G = 200
    rng = np.random.RandomState(3)
    boxes = grid_boxes(G)
    alphas = rng.uniform(-np.pi, np.pi, G)
    gt = [_with_alpha(make_anno(boxes), alphas)]
    dt = [_with_alpha(make_anno(boxes, scores=rng.permutation(G) / G + 0.5),
                      alphas + np.pi)]
    r = eval_class(gt, dt, 'car', 0, 0, 0.7, compute_aos=True)
    assert abs(map_r40(r['precision']) - 100.0) < 1e-9
    assert abs(map_r40(r['aos'])) < 1e-9


def test_aos_half_flipped_is_exactly_half_of_ap():
    """Half the matches have perfect heading, half are flipped by pi and
    score strictly below: at recall r <= 0.5 every matched dt is perfect
    (aos == precision == 1); past 0.5 orientation similarity accumulates
    only from the perfect half => AOS == 50 + small-sample tail, computed
    exactly below."""
    G = 200
    boxes = grid_boxes(G)
    alphas = np.zeros(G)
    d_alpha = np.concatenate([np.zeros(G // 2), np.full(G // 2, np.pi)])
    scores = np.concatenate([np.linspace(0.9, 0.8, G // 2),    # perfect half
                             np.linspace(0.4, 0.3, G // 2)])   # flipped half
    gt = [_with_alpha(make_anno(boxes), alphas)]
    dt = [_with_alpha(make_anno(boxes, scores=scores), alphas + d_alpha)]
    r = eval_class(gt, dt, 'car', 0, 0, 0.7, compute_aos=True)
    assert abs(map_r40(r['precision']) - 100.0) < 1e-9
    # exact hand value: at the 41 recall points r in {0, 1/40, ..., 1},
    # aos(r) = min(r, 0.5)/r (interpolated upward like precision); R40
    # drops the r=0 sample and averages the remaining 40
    rs = np.arange(1, 41) / 40.0
    want = np.mean(np.minimum(rs, 0.5) / rs) * 100.0
    assert abs(map_r40(r['aos']) - want) < 1e-6
