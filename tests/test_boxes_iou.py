"""Geometry tests: corners, rotation, point-in-box, rotated IoU, 3D IoU, NMS.

The rotated-IoU oracle is an independent numpy Sutherland–Hodgman convex
polygon clip (different algorithm from the production candidate-vertex code,
so agreement is meaningful).
"""

import numpy as np
import pytest

from epnet_tpu.ops import (
    boxes3d_to_bev,
    boxes3d_to_corners3d,
    boxes_iou3d,
    boxes_iou_bev,
    enlarge_box3d,
    greedy_suppress,
    iou_axis_aligned,
    nms_bev,
    points_in_boxes3d,
    rotate_points_along_y,
    rotated_overlap_bev,
)


def np_bev_corners(box):
    x1, y1, x2, y2, ang = box
    cx, cy = (x1 + x2) / 2, (y1 + y2) / 2
    pts = np.array([[x1, y1], [x2, y1], [x2, y2], [x1, y2]], dtype=np.float64)
    c, s = np.cos(ang), np.sin(ang)
    d = pts - [cx, cy]
    return np.stack([d[:, 0] * c + d[:, 1] * s + cx, -d[:, 0] * s + d[:, 1] * c + cy], axis=1)


def clip_polygon(subject, clip):
    """Sutherland–Hodgman convex clip; both CCW or CW consistent."""
    def inside(p, a, b):
        return (b[0] - a[0]) * (p[1] - a[1]) - (b[1] - a[1]) * (p[0] - a[0]) >= 0

    def seg_intersect(a, b, p, q):
        a, b, p, q = map(np.asarray, (a, b, p, q))
        d1, d2 = b - a, q - p
        denom = d1[0] * d2[1] - d1[1] * d2[0]
        t = ((p - a)[0] * d2[1] - (p - a)[1] * d2[0]) / denom
        return a + t * d1

    # ensure CCW orientation
    def ccw(poly):
        area = 0.0
        for i in range(len(poly)):
            j = (i + 1) % len(poly)
            area += poly[i][0] * poly[j][1] - poly[j][0] * poly[i][1]
        return poly if area > 0 else poly[::-1]

    out = list(ccw([tuple(p) for p in subject]))
    clip = ccw([tuple(p) for p in clip])
    for i in range(len(clip)):
        a, b = clip[i], clip[(i + 1) % len(clip)]
        src, out = out, []
        if not src:
            break
        prev = src[-1]
        for cur in src:
            if inside(cur, a, b):
                if not inside(prev, a, b):
                    out.append(tuple(seg_intersect(prev, cur, a, b)))
                out.append(cur)
            elif inside(prev, a, b):
                out.append(tuple(seg_intersect(prev, cur, a, b)))
            prev = cur
    return out


def poly_area(poly):
    if len(poly) < 3:
        return 0.0
    a = 0.0
    for i in range(len(poly)):
        j = (i + 1) % len(poly)
        a += poly[i][0] * poly[j][1] - poly[j][0] * poly[i][1]
    return abs(a) / 2


def np_rotated_overlap(boxes_a, boxes_b):
    out = np.zeros((len(boxes_a), len(boxes_b)))
    for i, a in enumerate(boxes_a):
        for j, b in enumerate(boxes_b):
            out[i, j] = poly_area(clip_polygon(np_bev_corners(a), np_bev_corners(b)))
    return out


@pytest.fixture(scope='module')
def rng():
    return np.random.RandomState(42)


def random_boxes_bev(rng, n):
    cx = rng.uniform(-5, 5, n)
    cy = rng.uniform(-5, 5, n)
    l = rng.uniform(1, 4, n)
    w = rng.uniform(1, 3, n)
    ang = rng.uniform(-np.pi, np.pi, n)
    return np.stack([cx - l / 2, cy - w / 2, cx + l / 2, cy + w / 2, ang], axis=1).astype(np.float32)


def test_rotate_points_roundtrip(rng):
    pts = rng.randn(4, 10, 3).astype(np.float32)
    ang = rng.uniform(-np.pi, np.pi, size=(4,)).astype(np.float32)
    fwd = rotate_points_along_y(pts, ang)
    back = rotate_points_along_y(np.asarray(fwd), -ang)
    np.testing.assert_allclose(np.asarray(back), pts, atol=1e-5)


def test_rotate_points_matches_reference_formula(rng):
    # reference: pc[:, [0, 2]] @ [[c, -s], [s, c]]^T  (kitti_utils.py:32-42)
    pts = rng.randn(10, 3).astype(np.float64)
    ang = 0.7
    c, s = np.cos(ang), np.sin(ang)
    want = pts.copy()
    want[:, [0, 2]] = pts[:, [0, 2]] @ np.array([[c, -s], [s, c]]).T
    got = rotate_points_along_y(pts[None].astype(np.float32), np.float32(ang))[0]
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)


def test_corners_identity_box():
    box = np.array([[1.0, 2.0, 3.0, 2.0, 1.0, 4.0, 0.0]], dtype=np.float32)
    c = np.asarray(boxes3d_to_corners3d(box))[0]
    assert c.shape == (8, 3)
    np.testing.assert_allclose(sorted(c[:, 0]), [-1, -1, -1, -1, 3, 3, 3, 3], atol=1e-5)
    np.testing.assert_allclose(sorted(c[:, 1]), [0, 0, 0, 0, 2, 2, 2, 2], atol=1e-5)  # y: 2, 2-h
    np.testing.assert_allclose(sorted(c[:, 2]), [2.5, 2.5, 2.5, 2.5, 3.5, 3.5, 3.5, 3.5], atol=1e-5)


def test_points_in_boxes_axis_aligned():
    boxes = np.array([[[0.0, 1.0, 0.0, 2.0, 2.0, 4.0, 0.0]]], dtype=np.float32)  # y in [-1, 1]
    pts = np.array([[[0, 0, 0], [1.9, 0, 0], [2.1, 0, 0], [0, -1.5, 0], [0, 0.5, 0.9], [0, 0, 1.2]]],
                   dtype=np.float32)
    got = np.asarray(points_in_boxes3d(pts, boxes))[0, 0]
    np.testing.assert_array_equal(got, [True, True, False, False, True, False])


def test_points_in_boxes_rotated(rng):
    # rotating both box and points by the same angle preserves membership
    pts = rng.randn(1, 200, 3).astype(np.float32) * 2
    box = np.array([[[0.5, 1.0, 0.3, 2.0, 1.5, 3.0, 0.0]]], dtype=np.float32)
    base = np.asarray(points_in_boxes3d(pts, box))
    ang = 0.6
    box_r = box.copy()
    box_r[..., 6] = ang
    # rotate points about the box center by the matching transform
    ctr = box[0, 0, [0, 1, 2]]
    rel = pts - ctr
    rot = np.asarray(rotate_points_along_y(rel, np.float32(-ang)))  # undo box rotation
    got = np.asarray(points_in_boxes3d(rot + ctr, box_r))
    np.testing.assert_array_equal(got, base)


def test_rotated_overlap_matches_sutherland_hodgman(rng):
    a = random_boxes_bev(rng, 12)
    b = random_boxes_bev(rng, 9)
    got = np.asarray(rotated_overlap_bev(a, b))
    want = np_rotated_overlap(a.astype(np.float64), b.astype(np.float64))
    np.testing.assert_allclose(got, want, atol=2e-3)


def test_rotated_overlap_identical_boxes(rng):
    a = random_boxes_bev(rng, 5)
    got = np.asarray(rotated_overlap_bev(a, a))
    areas = (a[:, 2] - a[:, 0]) * (a[:, 3] - a[:, 1])
    np.testing.assert_allclose(np.diag(got), areas, rtol=1e-3)
    iou = np.asarray(boxes_iou_bev(a, a))
    np.testing.assert_allclose(np.diag(iou), 1.0, atol=1e-3)


def test_iou3d_simple_overlap():
    # two unit boxes shifted by half a length in x
    a = np.array([[0, 0, 0, 1.0, 1.0, 1.0, 0.0]], dtype=np.float32)
    b = np.array([[0.5, 0, 0, 1.0, 1.0, 1.0, 0.0]], dtype=np.float32)
    got = float(np.asarray(boxes_iou3d(a, b))[0, 0])
    assert abs(got - 0.5 / 1.5) < 1e-3


def test_enlarge_box3d():
    b = np.array([[1, 2, 3, 1.5, 1.6, 3.9, 0.3]], dtype=np.float32)
    e = np.asarray(enlarge_box3d(b, 0.2))
    np.testing.assert_allclose(e[0], [1, 2.2, 3, 1.9, 2.0, 4.3, 0.3], atol=1e-6)


def np_greedy_nms(iou, thresh):
    n = iou.shape[0]
    suppressed = np.zeros(n, dtype=bool)
    keep = []
    for i in range(n):
        if suppressed[i]:
            continue
        keep.append(i)
        for j in range(i + 1, n):
            if iou[i, j] > thresh:
                suppressed[j] = True
    return keep


def test_greedy_suppress_matches_serial(rng):
    n = 200
    iou = rng.rand(n, n).astype(np.float32)
    iou = (iou + iou.T) / 2
    np.fill_diagonal(iou, 1.0)
    over = iou > 0.7
    kept = np.asarray(greedy_suppress(over))
    want = np.zeros(n, dtype=bool)
    want[np_greedy_nms(iou, 0.7)] = True
    np.testing.assert_array_equal(kept, want)


def test_nms_bev_end_to_end(rng):
    boxes3d = np.concatenate([
        rng.uniform(-20, 20, (60, 1)), rng.uniform(0, 2, (60, 1)),
        rng.uniform(0, 40, (60, 1)), rng.uniform(1.4, 1.8, (60, 1)),
        rng.uniform(1.5, 1.7, (60, 1)), rng.uniform(3.5, 4.2, (60, 1)),
        rng.uniform(-np.pi, np.pi, (60, 1))], axis=1).astype(np.float32)
    # add near-duplicates to force suppression
    boxes3d[30:] = boxes3d[:30] + rng.normal(0, 0.05, boxes3d[:30].shape).astype(np.float32)
    bev = np.asarray(boxes3d_to_bev(boxes3d))
    scores = rng.rand(60).astype(np.float32)

    idx, cnt = nms_bev(bev, scores, 0.8, max_keep=30, rotated=False)
    idx, cnt = np.asarray(idx), int(cnt)

    order = np.argsort(-scores, kind='stable')
    iou = np.asarray(iou_axis_aligned(bev[order], bev[order]))
    want_ranks = np_greedy_nms(iou, 0.8)[:30]
    want = order[want_ranks]
    assert cnt == len(want)
    np.testing.assert_array_equal(idx[:cnt], want)
