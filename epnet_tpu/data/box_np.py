"""Host-side (numpy) box geometry for the input pipeline.

Mirrors the jnp versions in ``epnet_tpu.ops.boxes`` (single source of truth
for semantics; these run in data-loader worker processes where numpy is the
right tool). Replaces ``lib/utils/kitti_utils.py`` numpy helpers and the
CPU roipool extension's point-in-box test (``roipool3d.cpp:82-196``).

A C++ fast path for the hot tests (point-in-rotated-box over full scenes)
lives in ``native/``; these numpy versions are the reference/fallback.
"""

from __future__ import annotations

import numpy as np


def rotate_pc_along_y(pc: np.ndarray, angle: float) -> np.ndarray:
    """In the camera frame, rotate x/z by `angle` (kitti_utils.py:32-42)."""
    c, s = np.cos(angle), np.sin(angle)
    out = pc.copy()
    out[..., 0] = c * pc[..., 0] - s * pc[..., 2]
    out[..., 2] = s * pc[..., 0] + c * pc[..., 2]
    return out


def boxes3d_to_corners3d(boxes3d: np.ndarray) -> np.ndarray:
    """(N, 7) -> (N, 8, 3); bottom face first (kitti_utils.py:66-103)."""
    h, w, l = boxes3d[:, 3], boxes3d[:, 4], boxes3d[:, 5]
    sign_x = np.array([1, 1, -1, -1, 1, 1, -1, -1], np.float32)
    sign_z = np.array([1, -1, -1, 1, 1, -1, -1, 1], np.float32)
    top = np.array([0, 0, 0, 0, 1, 1, 1, 1], np.float32)
    x_c = (l / 2)[:, None] * sign_x
    z_c = (w / 2)[:, None] * sign_z
    y_c = -h[:, None] * top
    ry = boxes3d[:, 6:7]
    c, s = np.cos(ry), np.sin(ry)
    xr = c * x_c + s * z_c
    zr = -s * x_c + c * z_c
    corners = np.stack([xr, y_c, zr], axis=-1)
    return (corners + boxes3d[:, None, 0:3]).astype(np.float32)


def enlarge_box3d(boxes3d: np.ndarray, extra_width: float) -> np.ndarray:
    out = boxes3d.copy()
    out[:, 3:6] += extra_width * 2
    out[:, 1] += extra_width
    return out


def points_in_box3d(pts: np.ndarray, box3d: np.ndarray) -> np.ndarray:
    """Analytic membership of (N, 3) points in one rotated box.

    Equivalent to the reference's Delaunay ``in_hull`` on box corners
    (kitti_utils.py:166-180) for convex boxes, and to the CUDA/CPU
    ``pt_in_box3d`` without the 10 m early-out.
    """
    cx, cy, cz = box3d[0], box3d[1], box3d[2]
    h, w, l, ry = box3d[3], box3d[4], box3d[5], box3d[6]
    px, py, pz = pts[:, 0] - cx, pts[:, 1] - cy, pts[:, 2] - cz
    in_y = np.abs(py + h / 2.0) <= h / 2.0
    c, s = np.cos(ry), np.sin(ry)
    x_rot = px * c - pz * s
    z_rot = px * s + pz * c
    return in_y & (np.abs(x_rot) <= l / 2.0) & (np.abs(z_rot) <= w / 2.0)


def points_in_boxes3d(pts: np.ndarray, boxes3d: np.ndarray) -> np.ndarray:
    """(N, 3) x (M, 7) -> (M, N) bool (vectorized; used for gt-aug overlap
    removal, replacing pts_in_boxes3d_cpu)."""
    from . import native

    if native.available():
        return native.points_in_boxes3d(pts, boxes3d)
    return np.stack([points_in_box3d(pts, b) for b in boxes3d], axis=0) \
        if len(boxes3d) else np.zeros((0, pts.shape[0]), bool)


def boxes_iou3d_cpu(boxes_a: np.ndarray, boxes_b: np.ndarray) -> np.ndarray:
    """Exact 3D IoU on host via convex polygon clipping — replaces the
    shapely-based ``get_iou3d`` (kitti_utils.py:198-238)."""
    from ..eval.rotate_iou_np import rotate_iou_bev  # noqa: deferred

    if len(boxes_a) == 0 or len(boxes_b) == 0:
        return np.zeros((len(boxes_a), len(boxes_b)), np.float32)
    bev_a = np.stack([boxes_a[:, 0], boxes_a[:, 2], boxes_a[:, 5], boxes_a[:, 4],
                      boxes_a[:, 6]], axis=1)
    bev_b = np.stack([boxes_b[:, 0], boxes_b[:, 2], boxes_b[:, 5], boxes_b[:, 4],
                      boxes_b[:, 6]], axis=1)
    ov = rotate_iou_bev(bev_a, bev_b, criterion=2)  # raw overlap area
    a_min, a_max = boxes_a[:, 1] - boxes_a[:, 3], boxes_a[:, 1]
    b_min, b_max = boxes_b[:, 1] - boxes_b[:, 3], boxes_b[:, 1]
    ov_h = np.clip(np.minimum(a_max[:, None], b_max[None, :])
                   - np.maximum(a_min[:, None], b_min[None, :]), 0, None)
    ov3d = ov * ov_h
    vol_a = (boxes_a[:, 3] * boxes_a[:, 4] * boxes_a[:, 5])[:, None]
    vol_b = (boxes_b[:, 3] * boxes_b[:, 4] * boxes_b[:, 5])[None, :]
    return ov3d / np.clip(vol_a + vol_b - ov3d, 1e-7, None)
