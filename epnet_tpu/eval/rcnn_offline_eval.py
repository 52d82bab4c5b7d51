"""RCNN-only (offline) evaluation: refine proposals loaded from files.

Rebuild of ``eval_one_epoch_rcnn`` (``/root/reference/tools/eval_rcnn.py:
278-495``): pooled roi samples come from ``get_proposal_from_file``
(dumped rpn features + proposal txts); the RCNN refines and re-scores them
(raw rcnn_cls only — the reference does not fuse roi scores either),
rotated NMS + KITTI txt output + AP follow. Frames are padded to a fixed
roi budget so one jitted program serves all frames.
"""

from __future__ import annotations

import os
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Config
from ..models.rcnn import RCNNNet
from ..ops.bbox_codec import decode_bbox_target
from ..ops.boxes import boxes3d_to_bev
from ..ops.nms import nms_bev

MAX_ROIS = 128  # fixed per-frame roi budget (test-time proposals are <=100)


def _unwrap_rcnn(variables):
    """Accept either bare RCNNNet variables or full-EPNet ones (prefix 'rcnn')."""
    out = {}
    for col in ('params', 'batch_stats'):
        tree = variables.get(col, {})
        out[col] = tree['rcnn'] if 'rcnn' in tree else tree
    return out


def make_rcnn_offline_eval_step(cfg: Config):
    model = RCNNNet(cfg)

    def step(variables, pts_input, rois, n_valid):
        out = model.apply(_unwrap_rcnn(variables), pts_input, train=False)
        if out['rcnn_cls'].shape[-1] > 1:
            # multi-class (People) head: objectness = 1 - P(background) as a
            # logit, matching detect.py's joint-eval handling
            prob_fg = 1.0 - jax.nn.softmax(
                out['rcnn_cls'].reshape(MAX_ROIS, -1), axis=-1)[..., 0]
            prob_fg = jnp.clip(prob_fg, 1e-7, 1.0 - 1e-7)
            rcnn_cls = jnp.log(prob_fg) - jnp.log1p(-prob_fg)
        else:
            rcnn_cls = out['rcnn_cls'].reshape(-1)
        rcnn_reg = out['rcnn_reg']
        if cfg.USE_IOU_BRANCH:
            iou_b = jnp.clip(out['rcnn_iou_branch'].reshape(-1), 1e-4, None)
            rcnn_cls = iou_b * rcnn_cls
        mean_size = jnp.asarray(cfg.CLS_MEAN_SIZE[0], rcnn_reg.dtype)
        pred = decode_bbox_target(
            rois, rcnn_reg, mean_size,
            loc_scope=cfg.RCNN.LOC_SCOPE, loc_bin_size=cfg.RCNN.LOC_BIN_SIZE,
            num_head_bin=cfg.RCNN.NUM_HEAD_BIN, get_xz_fine=True,
            get_y_by_bin=cfg.RCNN.LOC_Y_BY_BIN, loc_y_scope=cfg.RCNN.LOC_Y_SCOPE,
            loc_y_bin_size=cfg.RCNN.LOC_Y_BIN_SIZE, get_ry_fine=True,
            bbox_avg_by_bin=cfg.TEST.BBOX_AVG_BY_BIN,
            ry_with_bin=cfg.TEST.RY_WITH_BIN)
        norm = jax.nn.sigmoid(rcnn_cls)
        valid = jnp.arange(MAX_ROIS) < n_valid
        mask = (norm > cfg.RCNN.SCORE_THRESH) & valid
        scores = jnp.where(mask, rcnn_cls, -jnp.inf)
        bev = boxes3d_to_bev(pred)
        idx, cnt = nms_bev(bev, scores, cfg.RCNN.NMS_THRESH, max_keep=MAX_ROIS,
                           rotated=True, num_valid=jnp.sum(mask))
        return pred[idx], scores[idx], cnt

    return jax.jit(step)


def evaluate_rcnn_offline(cfg: Config, variables, dataset, result_dir: str,
                          logger=None, run_ap: bool = True) -> Dict:
    from .kitti_common import get_label_annos, parse_label_file, save_kitti_format

    step = make_rcnn_offline_eval_step(cfg)
    final_dir = os.path.join(result_dir, 'final_result', 'data')
    os.makedirs(final_dir, exist_ok=True)
    seen = []
    total = 0
    for i in range(len(dataset)):
        s = dataset[i]
        sid = s['sample_id']
        seen.append(sid)
        M = len(s['roi_boxes3d'])
        m = min(M, MAX_ROIS)
        S, C = s['pts_input'].shape[1], s['pts_input'].shape[2]
        pts = np.zeros((MAX_ROIS, S, C), np.float32)
        rois = np.zeros((MAX_ROIS, 7), np.float32)
        pts[:m] = s['pts_input'][:m]
        rois[:m] = s['roi_boxes3d'][:m]
        pred, sc, cnt = jax.device_get(step(
            variables, pts, rois, np.int32(m)))
        cnt = int(cnt)
        total += cnt
        save_kitti_format(final_dir, sid, dataset.get_calib(sid),
                          pred[:cnt], sc[:cnt], dataset.get_image_shape(sid),
                          classes=(cfg.CLASSES,))
    ret = {'rcnn_avg_num': total / max(len(seen), 1)}
    if run_ap:
        gt_annos = get_label_annos(dataset.label_dir, seen)
        dt_annos = [parse_label_file(os.path.join(final_dir, '%06d.txt' % i))
                    for i in seen]
        from .kitti_ap import get_official_eval_result
        report, ap = get_official_eval_result(gt_annos, dt_annos, cfg.CLASSES)
        ret['ap'] = ap
        ret['ap_report'] = report
        if logger:
            logger.info('\n%s', report)
    return ret
