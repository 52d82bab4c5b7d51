"""Stage-2 RCNN refinement head.

Rebuild of ``/root/reference/lib/net/rcnn_net.py`` (xyz-up/merge layers
:21-26,177-185, SA tower :28-42,189-192, cls/reg/iou heads :44-91,194-198).
Operates on (B*R, S, C) pooled canonical-frame points.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from ..config import Config
from .layers import PointwiseConv, SharedMLP, kaiming_normal
from .pointnet2 import SAModuleMSG


class RCNNNet(nn.Module):
    cfg: Config

    @nn.compact
    def __call__(self, pts_input, train: bool = False, bn_momentum=0.1):
        """
        :param pts_input: (B*R, S, 3 + C_in) canonical points + features
        :return: dict rcnn_cls (B*R, 1), rcnn_reg (B*R, C), [rcnn_iou_branch]
        """
        cfg = self.cfg
        rc = cfg.RCNN
        dt = jnp.bfloat16 if cfg.MIXED_PRECISION else None
        xyz = pts_input[..., 0:3]

        if rc.USE_RPN_FEATURES:
            # raw geometric channels -> 128, merged with rpn features
            ci = rc.input_channel
            xyz_feat = SharedMLP(rc.XYZ_UP_LAYER, bn=rc.USE_BN, dtype=dt, name='xyz_up')(
                pts_input[..., 0:ci], train=train, bn_momentum=bn_momentum)
            rpn_feat = pts_input[..., ci:]
            merged = jnp.concatenate([xyz_feat, rpn_feat], axis=-1)
            feats = SharedMLP((rc.XYZ_UP_LAYER[-1],), bn=rc.USE_BN, dtype=dt, name='merge_down')(
                merged, train=train, bn_momentum=bn_momentum)
        else:
            feats = pts_input[..., 3:]

        l_xyz, l_feats = xyz, feats
        for i, np_i in enumerate(rc.SA_CONFIG.NPOINTS):
            l_xyz, l_feats, _ = SAModuleMSG(
                npoint=None if np_i == -1 else np_i,
                radii=(rc.SA_CONFIG.RADIUS[i],),
                nsamples=(rc.SA_CONFIG.NSAMPLE[i],),
                mlps=(rc.SA_CONFIG.MLPS[i],),
                use_xyz=True, bn=rc.USE_BN, dtype=dt,
                block_local=rc.BLOCK_LOCAL,
                block_window=rc.BLOCK_WINDOW, block_c=rc.BLOCK_C,
                name=f'sa{i}')(
                    l_xyz, l_feats, train=train, bn_momentum=bn_momentum)

        x = l_feats[:, 0, :].astype(jnp.float32)  # (B*R, C) — final pool

        # binary -> single sigmoid logit; multi-class (People) -> n logits
        # (rcnn_net.py:45)
        cls_channel = 1 if cfg.num_classes == 2 else cfg.num_classes
        h = x
        for k, f in enumerate(rc.CLS_FC):
            h = PointwiseConv(f, bn=rc.USE_BN, name=f'cls_fc{k}')(
                h, train=train, bn_momentum=bn_momentum)
            if k == 0 and rc.DP_RATIO >= 0:
                h = nn.Dropout(rc.DP_RATIO, deterministic=not train)(h)
        rcnn_cls = nn.Dense(cls_channel, kernel_init=kaiming_normal(),
                            name='cls_out')(h)

        h = x
        for k, f in enumerate(rc.REG_FC):
            h = PointwiseConv(f, bn=rc.USE_BN, name=f'reg_fc{k}')(
                h, train=train, bn_momentum=bn_momentum)
            if k == 0 and rc.DP_RATIO >= 0:
                h = nn.Dropout(rc.DP_RATIO, deterministic=not train)(h)
        rcnn_reg = nn.Dense(rc.reg_channel,
                            kernel_init=nn.initializers.normal(stddev=0.001),
                            name='reg_out')(h)

        out = {'rcnn_cls': rcnn_cls, 'rcnn_reg': rcnn_reg}
        if cfg.USE_IOU_BRANCH:
            h = x
            h = PointwiseConv(rc.REG_FC[0], bn=rc.USE_BN, name='iou_fc0')(
                h, train=train, bn_momentum=bn_momentum)
            if rc.DP_RATIO >= 0:
                h = nn.Dropout(rc.DP_RATIO, deterministic=not train)(h)
            h = PointwiseConv(rc.REG_FC[1], bn=rc.USE_BN, name='iou_fc1')(
                h, train=train, bn_momentum=bn_momentum)
            out['rcnn_iou_branch'] = nn.Dense(1, kernel_init=kaiming_normal(),
                                              name='iou_out')(h)
        return out
