"""Full two-stage detector: RPN + proposals + RCNN.

Rebuild of ``/root/reference/lib/net/point_rcnn.py`` (joint forward :27-75)
as one functional flax module: the whole train/eval step — backbone,
proposal NMS, target sampling, pooling, refinement — is a single jitted
XLA program with static shapes (the reference crosses the GPU/CPU boundary
inside NMS and runs python loops in the target layer).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..config import Config
from ..ops.boxes import rotate_points_along_y
from ..ops.roipool3d import roipool3d
from .proposal import ProposalLayer
from .rcnn import RCNNNet
from .rpn import RPN
from .target_assign import proposal_target_layer


class EPNet(nn.Module):
    """mode: 'TRAIN' or 'TEST' — selects proposal budgets like the
    reference's cfg[mode] lookups."""

    cfg: Config
    mode: str = 'TRAIN'

    @nn.compact
    def __call__(self, batch, train: bool = False, bn_momentum=0.1):
        cfg = self.cfg
        out = {}

        assert cfg.RPN.ENABLED or cfg.RCNN.ENABLED

        if cfg.RPN.ENABLED:
            train_rpn = train and not cfg.RPN.FIXED
            rpn_out = RPN(cfg, name='rpn')(
                batch['pts_input'],
                image=batch.get('img'), xy=batch.get('pts_origin_xy'),
                train=train_rpn, bn_momentum=bn_momentum)
            if cfg.RPN.FIXED:
                rpn_out = jax.tree_util.tree_map(jax.lax.stop_gradient, rpn_out)
            out.update(rpn_out)

            if cfg.RCNN.ENABLED:
                sg = jax.lax.stop_gradient
                rpn_scores_raw = sg(rpn_out['rpn_cls'][..., 0])  # (B, N)
                rpn_reg = sg(rpn_out['rpn_reg'])
                backbone_xyz = sg(rpn_out['backbone_xyz'])
                rpn_scores_norm = jax.nn.sigmoid(rpn_scores_raw)
                seg_mask = (rpn_scores_norm > cfg.RPN.SCORE_THRESH).astype(rpn_reg.dtype)
                pts_depth = jnp.linalg.norm(backbone_xyz, axis=2)

                rois, roi_scores_raw, roi_counts = ProposalLayer(cfg, self.mode)(
                    rpn_scores_raw, rpn_reg, backbone_xyz)
                out.update(rois=rois, roi_scores_raw=roi_scores_raw,
                           seg_result=seg_mask, roi_counts=roi_counts)

                # The reference runs the proposal-target layer (incl. the
                # roipool gather of backbone features) under torch.no_grad()
                # (rcnn_net.py:130-135), so RCNN loss never backprops into
                # the RPN backbone even in joint training — only the RPN's
                # own losses train it. Match that: always stop-gradient the
                # features feeding the RCNN stage.
                rpn_features = sg(rpn_out['backbone_features'])

                if train:
                    key = self.make_rng('sampling')
                    tgt = proposal_target_layer(
                        key, rois, batch['gt_boxes3d'], backbone_xyz,
                        rpn_features, seg_mask, pts_depth, cfg)
                    pts_input = jnp.concatenate(
                        [tgt.sampled_pts.astype(tgt.pts_feature.dtype),
                         tgt.pts_feature], axis=-1)
                    out.update(tgt._asdict())
                else:
                    pts_input = _pool_for_eval(cfg, rois, backbone_xyz, rpn_features,
                                               seg_mask, pts_depth)
                rcnn_out = RCNNNet(cfg, name='rcnn')(
                    pts_input, train=train, bn_momentum=bn_momentum)
                out.update(rcnn_out)
        elif cfg.RCNN.ENABLED:
            # offline two-phase flow: pooled samples + targets come from the
            # data loader (point_rcnn.py:70-71, rcnn_net.py:165-173)
            pts = batch['pts_input']
            if pts.ndim == 4:  # (B, R, S, C) per-frame roi batches
                pts = pts.reshape(-1, pts.shape[2], pts.shape[3])
            rcnn_out = RCNNNet(cfg, name='rcnn')(
                pts, train=train, bn_momentum=bn_momentum)
            out.update(rcnn_out)
            for k in ('cls_label', 'reg_valid_mask', 'gt_iou', 'mask_score'):
                if k in batch:
                    out[k] = batch[k].reshape(-1)
            if 'gt_boxes3d_ct' in batch:
                out['gt_of_rois'] = batch['gt_boxes3d_ct'].reshape(-1, 7)
            if 'roi_boxes3d' in batch:
                out['roi_boxes3d'] = batch['roi_boxes3d'].reshape(-1, 7)

        return out


def _pool_for_eval(cfg: Config, rois, xyz, rpn_features, seg_mask, pts_depth):
    """Inference-path pooling + canonical transform (rcnn_net.py:137-164)."""
    extra = [seg_mask[..., None]]
    if cfg.RCNN.USE_DEPTH:
        extra.append((pts_depth / 70.0 - 0.5)[..., None])
    feats = jnp.concatenate(extra + [rpn_features], axis=-1)
    if cfg.MIXED_PRECISION:
        feats = feats.astype(jnp.bfloat16)  # halves the pooling gather traffic
    pxyz, pfeats, _, _ = roipool3d(xyz, feats, rois, cfg.RCNN.POOL_EXTRA_WIDTH,
                                sampled_pt_num=cfg.RCNN.NUM_POINTS)
    ctr = rois[..., 0:3]
    local = pxyz - ctr[:, :, None, :]  # canonical transform stays f32
    local = rotate_points_along_y(local, rois[..., 6, None])
    # under mixed precision the RCNN tower's first op casts to bf16 anyway;
    # concat in the narrow dtype so the (B*M, S, 3+C) input never lands f32
    pooled = jnp.concatenate([local.astype(pfeats.dtype), pfeats], axis=-1)
    B, M, S, C = pooled.shape
    return pooled.reshape(B * M, S, C)
