"""Joint two-stage inference + evaluation loop.

Rebuild of ``eval_one_epoch_joint`` (``/root/reference/tools/eval_rcnn.py:
498-745``): model forward, optional IoU-branch score fusion (:558-561),
RCNN box decode (:568-575), recall-vs-gt bookkeeping (:598-632), score
threshold + rotated NMS (:663-682), KITTI-format txt output and in-process
AP (:736-742).

TPU-first: everything through the final NMS is ONE jitted program with
fixed shapes (the per-image python loops of the reference become masked
batch ops); only file writing and AP accumulation stay on host.
"""

from __future__ import annotations

import os
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Config
from ..models.epnet import EPNet
from ..ops.bbox_codec import decode_bbox_target
from ..ops.boxes import boxes3d_to_bev
from ..ops.nms import nms_bev
from ..ops.rotated_iou import boxes_iou3d

THRESH_LIST = (0.1, 0.3, 0.5, 0.7, 0.9)


def make_joint_eval_step(cfg: Config, model: EPNet):
    """Returns jit fn(variables, batch) -> device dict."""

    def step(variables, batch):
        out = model.apply(variables, batch, train=False)
        B = batch['pts_input'].shape[0]
        M = cfg.TEST.RPN_POST_NMS_TOP_N
        rois = out['rois']
        if out['rcnn_cls'].shape[-1] > 1:
            # multi-class (People) head: objectness = 1 - P(background),
            # mapped back to a logit so downstream sigmoid scoring holds
            prob_fg = 1.0 - jax.nn.softmax(
                out['rcnn_cls'].reshape(B, M, -1), axis=-1)[..., 0]
            prob_fg = jnp.clip(prob_fg, 1e-7, 1.0 - 1e-7)
            rcnn_cls = jnp.log(prob_fg) - jnp.log1p(-prob_fg)
        else:
            rcnn_cls = out['rcnn_cls'].reshape(B, M)
        rcnn_reg = out['rcnn_reg'].reshape(B, M, -1)

        if cfg.USE_IOU_BRANCH:
            iou_b = jnp.clip(out['rcnn_iou_branch'].reshape(B, M), 1e-4, None)
            rcnn_cls = iou_b * rcnn_cls  # eval_rcnn.py:558-561

        mean_size = jnp.asarray(cfg.CLS_MEAN_SIZE[0], rcnn_reg.dtype)
        pred = decode_bbox_target(
            rois.reshape(-1, 7), rcnn_reg.reshape(B * M, -1), mean_size,
            loc_scope=cfg.RCNN.LOC_SCOPE, loc_bin_size=cfg.RCNN.LOC_BIN_SIZE,
            num_head_bin=cfg.RCNN.NUM_HEAD_BIN, get_xz_fine=True,
            get_y_by_bin=cfg.RCNN.LOC_Y_BY_BIN, loc_y_scope=cfg.RCNN.LOC_Y_SCOPE,
            loc_y_bin_size=cfg.RCNN.LOC_Y_BIN_SIZE, get_ry_fine=True,
            bbox_avg_by_bin=cfg.TEST.BBOX_AVG_BY_BIN,
            ry_with_bin=cfg.TEST.RY_WITH_BIN).reshape(B, M, 7)

        raw_scores = rcnn_cls
        norm_scores = jax.nn.sigmoid(raw_scores)
        keep_mask = norm_scores > cfg.RCNN.SCORE_THRESH
        roi_valid = jnp.any(rois != 0, axis=-1)  # zero-padded rois
        keep_mask = keep_mask & roi_valid

        def per_image(args):
            boxes, raw, mask = args
            # nms_bev sorts by score internally; -inf-masked dummies sort
            # last and num_valid stops the scan before them
            scores = jnp.where(mask, raw, -jnp.inf)
            idx, n = nms_bev(boxes3d_to_bev(boxes), scores,
                             cfg.RCNN.NMS_THRESH, max_keep=M,
                             rotated=True, num_valid=jnp.sum(mask))
            return boxes[idx], scores[idx], n

        final_boxes, final_scores, final_counts = jax.lax.map(
            per_image, (pred, raw_scores, keep_mask))

        res = {
            'pred_boxes3d': pred, 'raw_scores': raw_scores,
            'norm_scores': norm_scores, 'rois': rois,
            'roi_scores_raw': out['roi_scores_raw'],
            'seg_result': out['seg_result'],
            'final_boxes': final_boxes, 'final_scores': final_scores,
            'final_counts': final_counts,
        }

        # recall stats vs (zero-padded) gt, fully on device
        if 'gt_boxes3d' in batch:
            gt = batch['gt_boxes3d']
            gt_valid = jnp.any(gt != 0, axis=-1)  # (B, G)

            def recall_one(args):
                pred_b, roi_b, gt_b, gv, rv = args
                # zero-padded roi slots decode to spurious mean-size boxes
                # near the origin — exclude them from the recall max
                iou_p = boxes_iou3d(pred_b, gt_b) * rv[:, None]  # (M, G)
                iou_r = boxes_iou3d(roi_b, gt_b) * rv[:, None]
                gt_max_p = jnp.max(iou_p, axis=0)
                gt_max_r = jnp.max(iou_r, axis=0)
                rec_p = jnp.stack([jnp.sum((gt_max_p > t) & gv) for t in THRESH_LIST])
                rec_r = jnp.stack([jnp.sum((gt_max_r > t) & gv) for t in THRESH_LIST])
                return rec_p, rec_r

            rec_p, rec_r = jax.lax.map(
                recall_one,
                (pred, rois, gt, gt_valid, roi_valid.astype(pred.dtype)))
            res['recall_pred'] = jnp.sum(rec_p, axis=0)
            res['recall_roi'] = jnp.sum(rec_r, axis=0)
            res['gt_count'] = jnp.sum(gt_valid)

        if 'rpn_cls_label' in batch:
            seg = res['seg_result']
            lab = batch['rpn_cls_label']
            fg = lab > 0
            correct = jnp.sum((seg > 0) & fg)
            union = jnp.sum(fg) + jnp.sum(seg > 0) - correct
            res['rpn_iou'] = correct / jnp.clip(union, 1.0, None)

        return res

    return jax.jit(step)


def evaluate_joint(cfg: Config, variables, dataset, loader, result_dir: str,
                   logger=None, run_ap: bool = True,
                   save_result: bool = False) -> Dict:
    """Full epoch: inference, KITTI txt dump, recall + AP. With
    ``save_result``, also dump roi/refined boxes and per-point rpn outputs
    like the reference (eval_rcnn.py:639-660)."""
    from .kitti_common import get_label_annos, parse_label_file, save_kitti_format

    model = EPNet(cfg, mode='TEST')
    step = make_joint_eval_step(cfg, model)
    final_dir = os.path.join(result_dir, 'final_result', 'data')
    os.makedirs(final_dir, exist_ok=True)
    if save_result:
        roi_dir = os.path.join(result_dir, 'roi_result', 'data')
        refine_dir = os.path.join(result_dir, 'refine_result', 'data')
        os.makedirs(roi_dir, exist_ok=True)
        os.makedirs(refine_dir, exist_ok=True)

    tot_recall_pred = np.zeros(len(THRESH_LIST))
    tot_recall_roi = np.zeros(len(THRESH_LIST))
    tot_gt = 0
    tot_rpn_iou, n_batches, final_total = 0.0, 0, 0
    seen_ids = []

    for batch in loader:
        dev = {k: v for k, v in batch.items()
               if isinstance(v, np.ndarray) and k != 'sample_id'}
        res = jax.device_get(step(variables, dev))
        n_batches += 1
        if 'recall_pred' in res:
            tot_recall_pred += res['recall_pred']
            tot_recall_roi += res['recall_roi']
            tot_gt += int(res['gt_count'])
        if 'rpn_iou' in res:
            tot_rpn_iou += float(res['rpn_iou'])

        sample_ids = batch['sample_id']
        for k, sid in enumerate(np.atleast_1d(sample_ids)):
            sid = int(sid)
            seen_ids.append(sid)
            n = int(res['final_counts'][k])
            boxes = res['final_boxes'][k][:n]
            scores = res['final_scores'][k][:n]
            final_total += n
            calib = dataset.get_calib(sid)
            img_shape = dataset.get_image_shape(sid)
            save_kitti_format(final_dir, sid, calib, boxes, scores, img_shape,
                              classes=(cfg.CLASSES,))
            if save_result:
                save_kitti_format(roi_dir, sid, calib, res['rois'][k],
                                  res['roi_scores_raw'][k], img_shape,
                                  classes=(cfg.CLASSES,))
                save_kitti_format(refine_dir, sid, calib, res['pred_boxes3d'][k],
                                  res['raw_scores'][k], img_shape,
                                  classes=(cfg.CLASSES,))

    ret = {'rpn_iou': tot_rpn_iou / max(n_batches, 1),
           'rcnn_avg_num': final_total / max(len(seen_ids), 1)}
    for i, t in enumerate(THRESH_LIST):
        ret['rpn_recall(thresh=%.2f)' % t] = tot_recall_roi[i] / max(tot_gt, 1)
        ret['rcnn_recall(thresh=%.2f)' % t] = tot_recall_pred[i] / max(tot_gt, 1)
    if logger:
        for k, v in ret.items():
            logger.info('%s: %.4f', k, v)

    if run_ap:
        gt_annos = get_label_annos(dataset.label_dir, seen_ids)
        dt_annos = [parse_label_file(os.path.join(final_dir, '%06d.txt' % i))
                    for i in seen_ids]
        from .kitti_ap import get_official_eval_result
        report, ap = get_official_eval_result(gt_annos, dt_annos, cfg.CLASSES)
        if logger:
            logger.info('\n%s', report)
        ret['ap'] = ap
        ret['ap_report'] = report
    return ret
