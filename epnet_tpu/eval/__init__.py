from .kitti_ap import eval_class, get_official_eval_result, map_r40
from .detect import evaluate_joint, make_joint_eval_step

__all__ = ['eval_class', 'evaluate_joint', 'get_official_eval_result',
           'make_joint_eval_step', 'map_r40']
