"""Two-stream RPN backbone: PointNet++ MSG encoder/decoder with optional
LI-Fusion image stream.

Rebuild of ``Pointnet2MSG`` (``/root/reference/lib/net/pointnet2_msg.py:
127-248``): 4 MSG SA stages (16384 -> 4096 -> 1024 -> 256 -> 64 points)
fused per-stage with a strided image CNN via projected-coordinate bilinear
gathers and attention fusion, then 4 FP stages back to full resolution and
a deconv image pyramid fused into the final 128-d point features.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from flax import linen as nn

from ..config import Config
from ..ops.pointops import gather_points
from .fusion import (AttenFusionConv, DeconvFusionHead, FusionConv, ImageBlock,
                     feature_gather)
from .pointnet2 import FPModule, SAModuleMSG, sa_uses_block_local

IMG_SIZE = (1280.0, 384.0)  # fixed KITTI pad size (pointnet2_msg.py:207-210)


class PointBackbone(nn.Module):
    """Returns (xyz (B, N, 3), features (B, N, 128))."""

    cfg: Config

    @nn.compact
    def __call__(self, pts_input, image=None, xy=None, train: bool = False, bn_momentum=0.1):
        cfg = self.cfg
        sa = cfg.RPN.SA_CONFIG
        li = cfg.LI_FUSION
        dt = jnp.bfloat16 if cfg.MIXED_PRECISION else None

        xyz = pts_input[..., 0:3]
        feats = pts_input[..., 3:] if pts_input.shape[-1] > 3 else None

        # Perf-experiment knobs for the image tower (its backward is the
        # train-step dominator — tools/profile_train_cuts.py puts it at
        # 68.7 of ~100 ms backward at B4): EPNET_IMG_REMAT=1 rematerializes
        # each block in the backward (restructures XLA's fwd+bwd fusion
        # clusters); EPNET_IMG_F32=1 runs the tower in f32.
        import os
        img_block_cls = ImageBlock
        if os.environ.get('EPNET_IMG_REMAT', '0') == '1':
            # static_argnums counts flax's module-offset convention:
            # argnum 2 == `train` in ImageBlock.__call__(self, x, train,
            # bn_momentum). The call below passes train POSITIONALLY to
            # match; if ImageBlock's signature ever gains a parameter
            # before `train`, update this argnum with it.
            img_block_cls = nn.remat(ImageBlock, static_argnums=(2,))
        img_dt = None if os.environ.get('EPNET_IMG_F32', '0') == '1' else dt

        l_xyz, l_feats = [xyz], [feats]
        # per-level fps indices + Morton-sortedness (level 0 is sorted by the
        # loader when BLOCK_LOCAL or the FP_WINDOW middle mode is on; a level
        # stays sorted iff every SA stage below it sorted its picks — the
        # block-local path does, and FP_WINDOW forces it on the dense path)
        fp_win_mode = cfg.RPN.FP_WINDOW > 0
        l_idx, sorted_ok = [None], [bool(cfg.RPN.BLOCK_LOCAL) or fp_win_mode]

        if li.ENABLED:
            # normalize pixel coords to [-1, 1] (pointnet2_msg.py:207-210)
            xy_norm = jnp.stack([
                xy[..., 0] / (IMG_SIZE[0] - 1.0) * 2.0 - 1.0,
                xy[..., 1] / (IMG_SIZE[1] - 1.0) * 2.0 - 1.0,
            ], axis=-1)
            l_xy = [xy_norm]
            imgs = [image]

        for i in range(len(sa.NPOINTS)):
            li_xyz, li_feats_i, fps_idx = SAModuleMSG(
                npoint=sa.NPOINTS[i], radii=sa.RADIUS[i], nsamples=sa.NSAMPLE[i],
                mlps=sa.MLPS[i], use_xyz=True, bn=cfg.RPN.USE_BN, dtype=dt,
                sampler=cfg.RPN.SAMPLING, fps_groups=cfg.RPN.FPS_GROUPS,
                block_local=cfg.RPN.BLOCK_LOCAL, sort_fps=fp_win_mode,
                block_window=cfg.RPN.BLOCK_WINDOW, block_c=cfg.RPN.BLOCK_C,
                name=f'sa{i}')(l_xyz[i], l_feats[i], train=train, bn_momentum=bn_momentum)

            if li.ENABLED:
                li_xy = gather_points(l_xy[i], fps_idx)
                img_i = img_block_cls(li.IMG_CHANNELS[i + 1], dtype=img_dt, name=f'img_block{i}')(
                    imgs[i], train, bn_momentum)
                img_gathered = feature_gather(img_i, li_xy)
                if li.ADD_Image_Attention:
                    li_feats_i = AttenFusionConv(li.POINT_CHANNELS[i], dtype=dt, name=f'fusion{i}')(
                        li_feats_i, img_gathered, train=train, bn_momentum=bn_momentum)
                else:
                    li_feats_i = FusionConv(li.POINT_CHANNELS[i], dtype=dt, name=f'fusion{i}')(
                        li_feats_i, img_gathered, train=train, bn_momentum=bn_momentum)
                l_xy.append(li_xy)
                imgs.append(img_i)

            l_xyz.append(li_xyz)
            l_feats.append(li_feats_i)
            l_idx.append(fps_idx)
            sorted_ok.append(sorted_ok[i] and (fp_win_mode or
                sa_uses_block_local(
                    cfg.RPN.BLOCK_LOCAL, sa.NPOINTS[i], sa.RADIUS[i],
                    sa.NSAMPLE[i], l_xyz[i].shape[1], cfg.RPN.BLOCK_WINDOW,
                    cfg.RPN.BLOCK_C)))

        # FP decoder with skip connections (pointnet2_msg.py:232-235); when
        # both levels are Morton-sorted, the stage takes the windowed
        # block-local interpolation (ops/block_local.py)
        n_fp = len(cfg.RPN.FP_MLPS)
        # EPNET_FP_BLOCK=0: bisection knob — keep SA block-local but route
        # the FP decoder through the dense three_nn interpolation
        fp_block = ((cfg.RPN.BLOCK_LOCAL or fp_win_mode)
                    and os.environ.get('EPNET_FP_BLOCK', '1') != '0')
        # the middle mode interpolates from FP_WINDOW knowns per FP_UBLOCK
        # unknowns; full block-local keeps the round-4 256/512 geometry
        fp_w = cfg.RPN.FP_WINDOW if fp_win_mode else 256
        fp_u = cfg.RPN.FP_UBLOCK if fp_win_mode else 512
        fp_mods = [FPModule(mlp=cfg.RPN.FP_MLPS[k], bn=cfg.RPN.USE_BN, dtype=dt,
                            block_local=fp_block, window=fp_w, ublock=fp_u,
                            name=f'fp{k}')
                   for k in range(n_fp)]
        for i in range(-1, -(n_fp + 1), -1):
            l_feats[i - 1] = fp_mods[i](
                l_xyz[i - 1], l_xyz[i], l_feats[i - 1], l_feats[i],
                train=train, bn_momentum=bn_momentum,
                known_idx=l_idx[i] if sorted_ok[i] else None)

        if li.ENABLED:
            # deconv pyramid back to full image resolution, with the 1x1
            # reduction folded into each scale's matmul (pointnet2_msg.py:239-246)
            # fused head+BN+relu+sample: in training the full-res fusion map
            # is never materialized and its backward scatter is slot-
            # factorized at half resolution (ops/deconv_sample.py)
            img_pt = DeconvFusionHead(
                reduce=li.DeConv_Reduce, kernels=li.DeConv_Kernels,
                features=li.IMG_FEATURES_CHANNEL // 4, dtype=dt,
                name='deconv_fusion')(imgs[1:], train=train,
                                      bn_momentum=bn_momentum, xy=xy_norm)
            if li.ADD_Image_Attention:
                l_feats[0] = AttenFusionConv(li.IMG_FEATURES_CHANNEL, dtype=dt,
                                             name='final_fusion')(
                    l_feats[0], img_pt, train=train, bn_momentum=bn_momentum)
            else:
                l_feats[0] = FusionConv(li.IMG_FEATURES_CHANNEL, dtype=dt,
                                        name='final_fusion')(
                    l_feats[0], img_pt, train=train, bn_momentum=bn_momentum)

        return l_xyz[0], l_feats[0].astype(jnp.float32)
