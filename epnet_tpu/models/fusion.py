"""LI-Fusion: image stream blocks and the point<->image attention fusion.

Rebuild of ``/root/reference/lib/net/pointnet2_msg.py``: BasicBlock (:17-33),
Fusion_Conv (:35-48), IA_Layer (:52-81), Atten_Fusion_Conv (:84-104),
Feature_Gather (:107-120) — all channels-last (NHWC images, (B, N, C)
points) so 1x1 convs and the attention MLPs are MXU matmuls.
"""

from __future__ import annotations

import os
from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.grid_sample import grid_sample_points
from .layers import BatchNorm, Conv2dBlock, kaiming_normal


class ImageBlock(nn.Module):
    """conv3x3(s1) -> BN -> ReLU -> conv3x3(s2); halves resolution
    (pointnet2_msg.py:17-33)."""

    features: int
    dtype: object = None

    @nn.compact
    def __call__(self, x, train: bool = False, bn_momentum=0.1):
        x = Conv2dBlock(self.features, kernel=3, stride=1, bn=True, activation=True,
                        dtype=self.dtype)(x, train=train, bn_momentum=bn_momentum)
        x = Conv2dBlock(self.features, kernel=3, stride=2, dtype=self.dtype)(x, train=train)
        return x


def feature_gather(feature_map, xy_norm):
    """Bilinear image-feature fetch at projected point locations
    (Feature_Gather, pointnet2_msg.py:107-120). NHWC in, (B, N, C) out."""
    return grid_sample_points(feature_map, xy_norm)


class IALayer(nn.Module):
    """Image attention: per-point scalar gate on image features
    (IA_Layer, pointnet2_msg.py:52-81)."""

    point_channels: int
    dtype: object = None

    @nn.compact
    def __call__(self, img_feats, point_feats, train: bool = False, bn_momentum=0.1):
        pc = self.point_channels
        rc = pc // 4
        ri = nn.Dense(rc, kernel_init=kaiming_normal(), dtype=self.dtype)(img_feats)
        rp = nn.Dense(rc, kernel_init=kaiming_normal(), dtype=self.dtype)(point_feats)
        att = jax.nn.sigmoid(nn.Dense(1, kernel_init=kaiming_normal())(
            jnp.tanh(ri.astype(jnp.float32) + rp.astype(jnp.float32))))
        img_new = nn.Dense(pc, use_bias=False, kernel_init=kaiming_normal(),
                           dtype=self.dtype)(img_feats)
        img_new = BatchNorm()(img_new, train=train, momentum=bn_momentum)
        img_new = nn.relu(img_new)
        return img_new * att


class AttenFusionConv(nn.Module):
    """concat(point, gated image) -> 1x1 conv + BN + ReLU
    (Atten_Fusion_Conv, pointnet2_msg.py:84-104)."""

    out_channels: int
    dtype: object = None

    @nn.compact
    def __call__(self, point_feats, img_feats, train: bool = False, bn_momentum=0.1):
        pc = point_feats.shape[-1]
        gated = IALayer(point_channels=pc, dtype=self.dtype)(
            img_feats, point_feats, train=train, bn_momentum=bn_momentum)
        x = jnp.concatenate([point_feats, gated.astype(point_feats.dtype)], axis=-1)
        x = nn.Dense(self.out_channels, use_bias=False, kernel_init=kaiming_normal(),
                     dtype=self.dtype)(x)
        x = BatchNorm()(x, train=train, momentum=bn_momentum)
        return nn.relu(x)


class FusionConv(nn.Module):
    """Non-attention variant: concat -> 1x1 conv + BN + ReLU
    (Fusion_Conv, pointnet2_msg.py:35-48)."""

    out_channels: int
    dtype: object = None

    @nn.compact
    def __call__(self, point_feats, img_feats, train: bool = False, bn_momentum=0.1):
        x = jnp.concatenate([point_feats, img_feats], axis=-1)
        x = nn.Dense(self.out_channels, use_bias=False, kernel_init=kaiming_normal(),
                     dtype=self.dtype)(x)
        x = BatchNorm()(x, train=train, momentum=bn_momentum)
        return nn.relu(x)


class DeconvFusionHead(nn.Module):
    """Fused deconv pyramid + 1x1 reduction + BN + ReLU
    (pointnet2_msg.py:170-172, 239-246).

    The reference upsamples each image scale to full resolution with a
    ConvTranspose2d (kernel == stride, so output blocks never overlap),
    concatenates the four 16-channel maps and reduces them with a 1x1 conv.
    Because each deconv is ``depth_to_space(x_i @ wm_i)`` and the 1x1 conv
    distributes over the concat, the whole pyramid folds to

        sum_i depth_to_space(x_i @ (wm_i @ W_i)) + const

    where ``W_i`` is the slice of the reduction weight seeing scale i's
    channels. Folding ``W_i`` into each scale's matmul means the four
    full-resolution 16-channel maps, their 64-channel concat, and the
    separate 1x1-conv pass never reach HBM — only the final narrow map is
    materialized. Parameter count/shapes match the unfused modules
    (per-scale (k, k, C, r) kernel + (r,) bias, (sum r, F) reduction).
    """

    reduce: Sequence[int]
    kernels: Sequence[int]
    features: int
    dtype: object = None

    @nn.compact
    def __call__(self, imgs, train: bool = False, bn_momentum=0.1, xy=None):
        """With ``xy`` (B, N, 2 in [-1, 1]): returns the fused map *sampled
        at those points* (B, N, F). In training this takes the fused
        half-res custom-VJP path (ops/deconv_sample.py) — the
        full-resolution map is never materialized and the backward avoids
        the pathological full-res scatter. Without ``xy``: returns the
        dense full-res map (legacy behaviour)."""
        from .layers import BN_STAT_GROUPS

        fuse_w = self.param('fusion_kernel', kaiming_normal(),
                            (sum(self.reduce), self.features))
        cws = []
        bias_fused = jnp.zeros((self.features,), jnp.float32)
        off = 0
        dt = self.dtype or imgs[0].dtype
        for i, x in enumerate(imgs):
            k, r = self.kernels[i], self.reduce[i]
            C = x.shape[-1]
            kern = self.param(f'deconv{i}_kernel', kaiming_normal(),
                              (k, k, C, r))
            bias = self.param(f'deconv{i}_bias', nn.initializers.zeros, (r,))
            wi = fuse_w[off:off + r]
            off += r
            # fold the reduction slice into the deconv weight (f32, then cast)
            cws.append(jnp.einsum('klcr,rf->cklf', kern, wi).reshape(
                C, k * k * self.features).astype(dt))
            bias_fused = bias_fused + bias @ wi

        # Fused half-res path at train (custom VJP: no full-res map, no
        # full-res backward scatter) AND at eval since round 5 (running-stat
        # BN; the dense path's four full-res scale maps + their sum + the
        # normalized map never reach HBM — VERDICT r4 item 4 on the ~26
        # ms/B8 per-scan image stream). EPNET_FUSED_HEAD_EVAL=0 reverts
        # eval to the dense path for A/B.
        use_fused = (xy is not None and (BN_STAT_GROUPS == 1 or not train)
                     and all(k % 2 == 0 for k in self.kernels)
                     and os.environ.get('EPNET_FUSED_HEAD', '1') != '0'
                     and (train or os.environ.get('EPNET_FUSED_HEAD_EVAL',
                                                  '1') != '0'))
        if use_fused:
            from ..ops.deconv_sample import (deconv_bn_relu_sample,
                                             deconv_bn_relu_sample_eval)
            xs = tuple(x.astype(dt) for x in imgs)
            return BatchNorm(name='image_fusion_bn')(
                None, train=train, momentum=bn_momentum,
                fused_fn=lambda sc, bi: deconv_bn_relu_sample(
                    xs, tuple(cws), bias_fused, sc, bi, xy,
                    tuple(self.kernels), 1e-5),
                fused_eval_fn=lambda sc, bi, mu, va:
                    deconv_bn_relu_sample_eval(
                        xs, tuple(cws), bias_fused, sc, bi, mu, va, xy,
                        tuple(self.kernels), 1e-5),
                features=self.features)

        total = None
        for x, cw, k in zip(imgs, cws, self.kernels):
            B, h, w, _ = x.shape
            y = x.astype(dt) @ cw                  # (B, h, w, k*k*F)
            y = y.reshape(B, h, w, k, k, self.features)
            y = y.transpose(0, 1, 3, 2, 4, 5).reshape(
                B, h * k, w * k, self.features)
            total = y if total is None else total + y
        total = total + bias_fused.astype(total.dtype)
        total = BatchNorm(name='image_fusion_bn')(total, train=train,
                                                  momentum=bn_momentum)
        total = nn.relu(total)
        if xy is not None:
            return feature_gather(total, xy)
        return total


class DeConvUp(nn.Module):
    """Transposed-conv upsample head bringing one image scale to full
    resolution (pointnet2_msg.py:170-172).

    The reference uses ConvTranspose2d with kernel == stride, so output
    blocks never overlap: each input pixel independently projects to a
    (k, k, features) block. Expressed as ``nn.ConvTranspose`` XLA lowers
    this into pathological pad/dynamic-slice pyramids (~45 GB of counted
    HBM traffic in the B4 train step at the 16x16 scale); the equivalent
    per-pixel matmul + depth-to-space below is one MXU op and two cheap
    reshuffles. Same parameter shapes/init as ConvTranspose ((k, k, Cin,
    Cout) kernel + (Cout,) bias), different param names than round-1
    checkpoints (ConvTranspose_0/* -> kernel/bias).
    """

    features: int
    kernel: int
    dtype: object = None

    @nn.compact
    def __call__(self, x):
        k = self.kernel
        B, h, w, C = x.shape
        kern = self.param('kernel', kaiming_normal(),
                          (k, k, C, self.features))
        bias = self.param('bias', nn.initializers.zeros, (self.features,))
        dt = self.dtype or x.dtype
        wm = kern.astype(dt).transpose(2, 0, 1, 3).reshape(
            C, k * k * self.features)
        y = x.astype(dt) @ wm                      # (B, h, w, k*k*F)
        y = y.reshape(B, h, w, k, k, self.features)
        y = y.transpose(0, 1, 3, 2, 4, 5).reshape(B, h * k, w * k,
                                                  self.features)
        return y + bias.astype(dt)
