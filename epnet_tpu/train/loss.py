"""Joint RPN + RCNN loss assembly.

Rebuild of ``/root/reference/lib/net/train_functions.py`` (rpn loss
:92-163, rcnn loss :165-284) on the masked-dense loss primitives: the
reference gathers dynamically-sized foreground subsets; here every term is
a masked mean over fixed shapes, which matches its mean-over-foreground
reductions exactly.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config import Config
from ..losses import (
    binary_cross_entropy,
    dice_loss,
    get_reg_loss,
    sigmoid_cross_entropy_with_logits,
    sigmoid_focal_loss,
)


def rpn_loss(cfg: Config, rpn_cls, rpn_reg, cls_label, reg_label):
    """
    :param rpn_cls: (B, N, 1) logits; rpn_reg (B, N, C)
    :param cls_label: (B, N) in {1, 0, -1}; reg_label (B, N, 7)
    """
    tb = {}
    label_flat = cls_label.reshape(-1).astype(jnp.float32)
    cls_flat = rpn_cls.reshape(-1)
    fg_mask = label_flat > 0

    if cfg.RPN.LOSS_CLS == 'DiceLoss':
        loss_cls = dice_loss(cls_flat, label_flat, ignore_target=-1)
    elif cfg.RPN.LOSS_CLS == 'SigmoidFocalLoss':
        target = fg_mask.astype(jnp.float32)
        pos = target
        neg = (label_flat == 0).astype(jnp.float32)
        w = (pos + neg) / jnp.clip(jnp.sum(pos), 1.0, None)
        per = sigmoid_focal_loss(cls_flat, target, w,
                                 gamma=cfg.RPN.FOCAL_GAMMA, alpha=cfg.RPN.FOCAL_ALPHA[0])
        tb['rpn_loss_cls_pos'] = jnp.sum(per * pos)
        tb['rpn_loss_cls_neg'] = jnp.sum(per * neg)
        loss_cls = jnp.sum(per)
    elif cfg.RPN.LOSS_CLS == 'BinaryCrossEntropy':
        # the reference computes BCE(sigmoid(x), t); the logits form is
        # identical and NaN-safe when sigmoid saturates
        w = jnp.where(fg_mask, cfg.RPN.FG_WEIGHT, 1.0)
        per = sigmoid_cross_entropy_with_logits(cls_flat, fg_mask.astype(jnp.float32)) * w
        valid = (label_flat >= 0).astype(jnp.float32)
        loss_cls = jnp.sum(per * valid) / jnp.clip(jnp.sum(valid), 1.0, None)
    else:
        raise NotImplementedError(cfg.RPN.LOSS_CLS)

    mean_size = jnp.asarray(cfg.CLS_MEAN_SIZE[0], rpn_reg.dtype)
    sig = jax.nn.sigmoid(cls_flat)
    loc, angle, size, iou, _ = get_reg_loss(
        sig, sig, rpn_reg.reshape(-1, rpn_reg.shape[-1]), reg_label.reshape(-1, 7),
        fg_mask.astype(jnp.float32),
        loc_scope=cfg.RPN.LOC_SCOPE, loc_bin_size=cfg.RPN.LOC_BIN_SIZE,
        num_head_bin=cfg.RPN.NUM_HEAD_BIN, anchor_size=mean_size,
        get_xz_fine=cfg.RPN.LOC_XZ_FINE, use_cls_score=True, use_mask_score=False,
        iou_loss_type=cfg.TRAIN.IOU_LOSS_TYPE)

    size = 3.0 * size  # train_functions.py:147
    iou = cfg.TRAIN.CE_WEIGHT * iou
    loss_reg = loc + angle + size + iou
    # all-background batches: reference zeroes the reg loss; masked means
    # already give 0 there.
    loss = loss_cls * cfg.RPN.LOSS_WEIGHT[0] + loss_reg * cfg.RPN.LOSS_WEIGHT[1]
    tb.update(rpn_loss_cls=loss_cls, rpn_loss_reg=loss_reg, rpn_loss=loss,
              rpn_loss_loc=loc, rpn_loss_angle=angle, rpn_loss_size=size,
              rpn_loss_iou=iou, rpn_fg_sum=jnp.sum(fg_mask))
    return loss, tb


def rcnn_loss(cfg: Config, out):
    """Takes the model output dict holding rcnn_cls/rcnn_reg and the target
    fields from the proposal-target layer (train_functions.py:165-284)."""
    tb = {}
    rcnn_cls = out['rcnn_cls']
    rcnn_reg = out['rcnn_reg']
    cls_label = out['cls_label'].astype(jnp.float32)
    reg_valid_mask = out['reg_valid_mask']
    gt_ct = out['gt_of_rois']
    mask_score = out['mask_score']
    cls_flat = rcnn_cls.reshape(-1)

    if cfg.RCNN.LOSS_CLS == 'SigmoidFocalLoss':
        target = (cls_label > 0).astype(jnp.float32)
        pos, neg = target, (cls_label == 0).astype(jnp.float32)
        w = (pos + neg) / jnp.clip(jnp.sum(pos), 1.0, None)
        per = sigmoid_focal_loss(cls_flat, target, w,
                                 gamma=cfg.RCNN.FOCAL_GAMMA, alpha=cfg.RCNN.FOCAL_ALPHA[0])
        loss_cls = jnp.sum(per)
    elif cfg.RCNN.LOSS_CLS == 'BinaryCrossEntropy':
        valid = (cls_label >= 0).astype(jnp.float32)
        per = sigmoid_cross_entropy_with_logits(cls_flat, jnp.clip(cls_label, 0.0, 1.0))
        loss_cls = jnp.sum(per * valid) / jnp.clip(jnp.sum(valid), 1.0, None)
    elif cfg.RCNN.LOSS_CLS == 'CrossEntropy':
        # multi-class head (People config): weighted CE with ignore -1
        logits = rcnn_cls.reshape(rcnn_cls.shape[0], -1)
        target = jnp.clip(cls_label, 0, None).astype(jnp.int32)
        valid = (cls_label >= 0).astype(jnp.float32)
        weights = jnp.asarray(cfg.RCNN.CLS_WEIGHT, jnp.float32)
        logp = jax.nn.log_softmax(logits, axis=-1)
        per = -jnp.take_along_axis(logp, target[:, None], axis=-1)[:, 0]
        per = per * weights[target]
        loss_cls = jnp.sum(per * valid) / jnp.clip(jnp.sum(valid), 1.0, None)
    else:
        raise NotImplementedError(cfg.RCNN.LOSS_CLS)

    fg_mask = (reg_valid_mask > 0).astype(jnp.float32)
    mean_size = jnp.asarray(cfg.CLS_MEAN_SIZE[0], rcnn_reg.dtype)
    if rcnn_cls.shape[-1] > 1 and cfg.RCNN.LOSS_CLS == 'CrossEntropy':
        # multi-class head: objectness for the iou-weighted reg loss is
        # 1 - P(background). (The reference's CE branch would hit an
        # undefined `rcnn_cls_flat` in train_functions.py:236 — its
        # multi-class training is unreachable as shipped, so this is the
        # sensible completion, not a behaviour match.)
        n_roi = rcnn_cls.shape[0]
        sig = 1.0 - jax.nn.softmax(
            rcnn_cls.reshape(n_roi, -1), axis=-1)[:, 0]
    else:
        n_roi = cls_flat.shape[0]
        sig = jax.nn.sigmoid(cls_flat)
    iou_branch_pred = out.get('rcnn_iou_branch')
    loc, angle, size, iou, d = get_reg_loss(
        sig, mask_score, rcnn_reg.reshape(n_roi, -1), gt_ct.reshape(-1, 7),
        fg_mask,
        loc_scope=cfg.RCNN.LOC_SCOPE, loc_bin_size=cfg.RCNN.LOC_BIN_SIZE,
        num_head_bin=cfg.RCNN.NUM_HEAD_BIN, anchor_size=mean_size,
        get_xz_fine=True, get_y_by_bin=cfg.RCNN.LOC_Y_BY_BIN,
        loc_y_scope=cfg.RCNN.LOC_Y_SCOPE, loc_y_bin_size=cfg.RCNN.LOC_Y_BIN_SIZE,
        get_ry_fine=True, use_cls_score=True, use_mask_score=True,
        use_iou_branch=cfg.USE_IOU_BRANCH, iou_branch_pred=iou_branch_pred,
        iou_loss_type=cfg.TRAIN.IOU_LOSS_TYPE)

    size = 3.0 * size
    iou = cfg.TRAIN.CE_WEIGHT * iou
    loss_reg = loc + angle + size + iou
    if cfg.USE_IOU_BRANCH:
        loss_reg = loss_reg + d['iou_branch_loss']
        tb['iou_branch_loss'] = d['iou_branch_loss']
    loss = loss_cls + loss_reg
    tb.update(rcnn_loss_cls=loss_cls, rcnn_loss_reg=loss_reg, rcnn_loss=loss,
              rcnn_loss_loc=loc, rcnn_loss_angle=angle, rcnn_loss_size=size,
              rcnn_loss_iou=iou,
              rcnn_cls_fg=jnp.sum(cls_label > 0), rcnn_cls_bg=jnp.sum(cls_label == 0),
              rcnn_reg_fg=jnp.sum(reg_valid_mask))
    return loss, tb


def joint_loss(cfg: Config, out, batch):
    """Total loss (train_functions.py:50-90)."""
    tb = {}
    loss = 0.0
    if cfg.RPN.ENABLED and not cfg.RPN.FIXED:
        l, t = rpn_loss(cfg, out['rpn_cls'], out['rpn_reg'],
                        batch['rpn_cls_label'], batch['rpn_reg_label'])
        loss = loss + l * cfg.TRAIN.RPN_TRAIN_WEIGHT
        tb.update(t)
    if cfg.RCNN.ENABLED:
        l, t = rcnn_loss(cfg, out)
        loss = loss + l * cfg.TRAIN.RCNN_TRAIN_WEIGHT
        tb.update(t)
    tb['loss'] = loss
    return loss, tb
