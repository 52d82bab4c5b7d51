"""RPN-only evaluation: proposal recall, seg IoU, optional feature dump.

Rebuild of ``eval_one_epoch_rpn`` (``/root/reference/tools/eval_rcnn.py:
120-275``) and the offline-RCNN feature dump (``save_rpn_features``,
:104-117): per-checkpoint recall at IoU {0.1..0.9}, foreground
segmentation IoU, and .npy dumps consumed by the two-phase rcnn flow.
"""

from __future__ import annotations

import os
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Config
from ..models.epnet import EPNet
from ..models.proposal import ProposalLayer
from ..ops.rotated_iou import boxes_iou3d

THRESH_LIST = (0.1, 0.3, 0.5, 0.7, 0.9)


def make_rpn_eval_step(cfg: Config, model: EPNet):
    player = ProposalLayer(cfg, mode='TEST')

    def step(variables, batch):
        out = model.apply(variables, batch, train=False)
        scores_raw = out['rpn_cls'][..., 0]
        rois, roi_scores, counts = player(scores_raw, out['rpn_reg'],
                                          out['backbone_xyz'])
        seg = (jax.nn.sigmoid(scores_raw) > cfg.RPN.SCORE_THRESH)
        res = {'rois': rois, 'roi_scores': roi_scores, 'counts': counts,
               'seg': seg, 'backbone_xyz': out['backbone_xyz'],
               'backbone_features': out['backbone_features'],
               'rpn_scores_raw': scores_raw}

        if 'gt_boxes3d' in batch:
            gt = batch['gt_boxes3d']
            gt_valid = jnp.any(gt != 0, axis=-1)

            def recall_one(args):
                rois_b, gt_b, gv = args
                iou = boxes_iou3d(rois_b, gt_b)
                gt_max = jnp.max(iou, axis=0)
                return jnp.stack([jnp.sum((gt_max > t) & gv) for t in THRESH_LIST])

            rec = jax.lax.map(recall_one, (rois, gt, gt_valid))
            res['recall'] = jnp.sum(rec, axis=0)
            res['gt_count'] = jnp.sum(gt_valid)
        if 'rpn_cls_label' in batch:
            lab = batch['rpn_cls_label']
            fg = lab > 0
            correct = jnp.sum(seg & fg)
            union = jnp.sum(fg) + jnp.sum(seg) - correct
            res['seg_iou'] = correct / jnp.clip(union, 1.0, None)
        return res

    return jax.jit(step)


def evaluate_rpn(cfg: Config, variables, dataset, loader, result_dir: str,
                 logger=None, save_rpn_feature: bool = False) -> Dict:
    model = EPNet(cfg, mode='TEST')
    step = make_rpn_eval_step(cfg, model)
    feat_dir = os.path.join(result_dir, 'features')
    roi_dir = os.path.join(result_dir, 'roi_result', 'data')
    if save_rpn_feature:
        os.makedirs(feat_dir, exist_ok=True)
        os.makedirs(roi_dir, exist_ok=True)

    tot_recall = np.zeros(len(THRESH_LIST))
    tot_gt, tot_iou, n = 0, 0.0, 0
    for batch in loader:
        dev = {k: v for k, v in batch.items()
               if isinstance(v, np.ndarray) and k != 'sample_id'}
        res = jax.device_get(step(variables, dev))
        n += 1
        if 'recall' in res:
            tot_recall += res['recall']
            tot_gt += int(res['gt_count'])
        if 'seg_iou' in res:
            tot_iou += float(res['seg_iou'])
        if save_rpn_feature:
            from .kitti_common import save_kitti_format

            for k, sid in enumerate(np.atleast_1d(batch['sample_id'])):
                sid = int(sid)
                n_roi = int(res['counts'][k])
                save_kitti_format(roi_dir, sid, dataset.get_calib(sid),
                                  res['rois'][k][:n_roi],
                                  res['roi_scores'][k][:n_roi],
                                  dataset.get_image_shape(sid),
                                  classes=(cfg.CLASSES,))
                np.save(os.path.join(feat_dir, '%06d.npy' % sid),
                        res['backbone_features'][k])
                np.save(os.path.join(feat_dir, '%06d_xyz.npy' % sid),
                        res['backbone_xyz'][k])
                inten = batch['pts_input'][k][:, 3] \
                    if batch['pts_input'].shape[-1] > 3 \
                    else np.zeros(res['backbone_xyz'].shape[1], np.float32)
                np.save(os.path.join(feat_dir, '%06d_intensity.npy' % sid), inten)
                np.save(os.path.join(feat_dir, '%06d_seg.npy' % sid),
                        res['seg'][k].astype(np.float32))
                np.save(os.path.join(feat_dir, '%06d_rawscore.npy' % sid),
                        res['rpn_scores_raw'][k])

    ret = {'seg_iou': tot_iou / max(n, 1)}
    for i, t in enumerate(THRESH_LIST):
        ret['rpn_recall(thresh=%.2f)' % t] = tot_recall[i] / max(tot_gt, 1)
    if logger:
        for k, v in ret.items():
            logger.info('%s: %.4f', k, v)
    return ret
