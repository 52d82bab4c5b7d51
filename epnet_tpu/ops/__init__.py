from .boxes import (
    boxes3d_to_bev,
    boxes3d_to_corners3d,
    enlarge_box3d,
    points_in_boxes3d,
    rotate_points_along_y,
)
from .bbox_codec import decode_bbox_target, encode_targets
from .block_local import block_local_group_nested
from .grid_sample import grid_sample_points
from .morton import morton_argsort_np, morton_code_np
from .nms import greedy_suppress, nms_bev
from .pointops import (
    ball_query,
    furthest_point_sample,
    furthest_point_sample_xla,
    gather_points,
    group_points,
    three_interpolate,
    three_nn,
)
from .roipool3d import roipool3d
from .rotated_iou import boxes_iou3d, boxes_iou_bev, iou_axis_aligned, rotated_overlap_bev

__all__ = [
    'ball_query', 'block_local_group_nested', 'boxes3d_to_bev',
    'boxes3d_to_corners3d', 'boxes_iou3d',
    'boxes_iou_bev', 'decode_bbox_target', 'encode_targets', 'enlarge_box3d',
    'furthest_point_sample', 'furthest_point_sample_xla', 'gather_points',
    'greedy_suppress', 'grid_sample_points', 'group_points',
    'iou_axis_aligned', 'morton_argsort_np', 'morton_code_np', 'nms_bev',
    'points_in_boxes3d', 'roipool3d',
    'rotate_points_along_y', 'rotated_overlap_bev', 'three_interpolate',
    'three_nn',
]
