"""Stage-1 RPN: two-stream backbone + per-point cls/reg heads.

Rebuild of ``/root/reference/lib/net/rpn.py`` (heads :23-50, focal bias /
reg weight init :65-70, forward :72-92). Heads are per-point Dense stacks
(the reference's 1x1 Conv1d) with dropout after the first layer.
"""

from __future__ import annotations

import math

import jax.numpy as jnp
from flax import linen as nn

from ..config import Config
from .backbone import PointBackbone
from .layers import PointwiseConv, kaiming_normal


def _focal_bias_init(pi: float = 0.01):
    b = -math.log((1 - pi) / pi)
    return lambda key, shape, dtype=jnp.float32: jnp.full(shape, b, dtype)


class RPN(nn.Module):
    cfg: Config

    @nn.compact
    def __call__(self, pts_input, image=None, xy=None, train: bool = False, bn_momentum=0.1):
        cfg = self.cfg
        backbone_xyz, backbone_features = PointBackbone(cfg, name='backbone')(
            pts_input, image=image, xy=xy, train=train, bn_momentum=bn_momentum)

        x = backbone_features
        # classification branch (rpn.py:23-32)
        h = x
        for k, f in enumerate(cfg.RPN.CLS_FC):
            h = PointwiseConv(f, bn=cfg.RPN.USE_BN, name=f'cls_fc{k}')(
                h, train=train, bn_momentum=bn_momentum)
            if k == 0 and cfg.RPN.DP_RATIO >= 0:
                h = nn.Dropout(cfg.RPN.DP_RATIO, deterministic=not train)(h)
        cls_bias = _focal_bias_init() if cfg.RPN.LOSS_CLS == 'SigmoidFocalLoss' \
            else nn.initializers.zeros
        rpn_cls = nn.Dense(1, kernel_init=kaiming_normal(), bias_init=cls_bias,
                           name='cls_out')(h)  # (B, N, 1)

        # regression branch (rpn.py:34-50); final weights ~ N(0, 0.001)
        h = x
        for k, f in enumerate(cfg.RPN.REG_FC):
            h = PointwiseConv(f, bn=cfg.RPN.USE_BN, name=f'reg_fc{k}')(
                h, train=train, bn_momentum=bn_momentum)
            if k == 0 and cfg.RPN.DP_RATIO >= 0:
                h = nn.Dropout(cfg.RPN.DP_RATIO, deterministic=not train)(h)
        rpn_reg = nn.Dense(cfg.RPN.reg_channel,
                           kernel_init=nn.initializers.normal(stddev=0.001),
                           name='reg_out')(h)  # (B, N, C)

        return {
            'rpn_cls': rpn_cls,
            'rpn_reg': rpn_reg,
            'backbone_xyz': backbone_xyz,
            'backbone_features': backbone_features,
        }
