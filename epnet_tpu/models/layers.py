"""Core NN building blocks (flax.linen, channels-last / NHWC).

Replaces the reference's ``pointnet2_lib/pointnet2/pytorch_utils.py``
(SharedMLP :5-32, Conv1d/Conv2d wrappers :35-235). Differences that are
TPU-first on purpose:

  * channels-last everywhere: point features are (B, N, C) and images are
    NHWC, so the 1x1 convs become plain matmuls that tile onto the MXU.
  * BatchNorm takes its (torch-convention) momentum as a *call argument* so
    the reference's BN-momentum schedule (train_utils.py:22-43) becomes a
    traced scalar instead of a module mutation.
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn


def kaiming_normal():
    # matches torch.nn.init.kaiming_normal_ (fan_in, relu gain) used at
    # pytorch_utils.py (init=nn.init.kaiming_normal_)
    return nn.initializers.variance_scaling(2.0, 'fan_in', 'truncated_normal')


# Trace-time global emulating the reference's BatchNorm semantics under
# torch.nn.DataParallel (train_rcnn.py:221-222): each replica normalizes its
# own batch/n_gpus slice with *local* statistics and the surviving running
# stats are device 0's. Under GSPMD our BN reductions are global-batch by
# default (a deliberate, usually-better deviation); setting this to the
# emulated device count reproduces the reference's per-device behaviour for
# the A/B ablation in tools/bn_stats_ablation.py. Jit-static: rebuild jitted
# closures after flipping it (same pattern as ops.pointops.EXACT_QUERIES).
BN_STAT_GROUPS = 1


class BatchNorm(nn.Module):
    """Torch-semantics batch norm with runtime momentum.

    running = (1 - m) * running + m * batch   (torch convention; the
    reference schedules m per epoch, train_utils.py:22-43). Normalization
    uses biased batch variance; the running update uses the unbiased one,
    matching torch.nn.BatchNorm.
    """

    eps: float = 1e-5

    @nn.compact
    def __call__(self, x, train: bool, momentum=0.1, fused_fn=None,
                 features=None, fused_eval_fn=None):
        if fused_fn is not None or fused_eval_fn is not None:
            # Fused-consumer mode: the caller computes the normalized +
            # consumed output AND (train) the batch statistics in one
            # custom-VJP op (ops/deconv_sample.py); this module only owns
            # the variables and the torch-convention running-stat update,
            # so parameter / batch_stats paths stay identical to the dense
            # path. At eval, ``fused_eval_fn(scale, bias, mean, var)``
            # consumes the RUNNING stats instead (forward only).
            C = features
            ra_mean = self.variable('batch_stats', 'mean',
                                    lambda: jnp.zeros(C, jnp.float32))
            ra_var = self.variable('batch_stats', 'var',
                                   lambda: jnp.ones(C, jnp.float32))
            scale = self.param('scale', nn.initializers.ones, (C,))
            bias = self.param('bias', nn.initializers.zeros, (C,))
            if not train:
                assert fused_eval_fn is not None, \
                    'fused_fn path needs fused_eval_fn at eval'
                return fused_eval_fn(scale, bias, ra_mean.value,
                                     ra_var.value)
            out, mean, unbiased = fused_fn(scale, bias)
            if not self.is_initializing():
                m = jnp.asarray(momentum, jnp.float32)
                ra_mean.value = (1 - m) * ra_mean.value + \
                    m * jax.lax.stop_gradient(mean)
                ra_var.value = (1 - m) * ra_var.value + \
                    m * jax.lax.stop_gradient(unbiased)
            return out
        C = x.shape[-1]
        in_dtype = x.dtype
        # Statistics accumulate in f32 via reduction dtype — but the
        # activation itself is never materialized as an f32 copy: under
        # mixed precision, an explicit astype(f32) of e.g. the full-res
        # image-tower tensor costs ~25 GB of counted HBM traffic per B4
        # train step (tools/train_hlo_dump.py). Elementwise normalization
        # runs in the caller's dtype (flax nn.BatchNorm(dtype=bf16)
        # semantics); the per-device-group path keeps the old exact f32
        # form (it is an ablation knob, not a hot path).
        ra_mean = self.variable('batch_stats', 'mean', lambda: jnp.zeros(C, jnp.float32))
        ra_var = self.variable('batch_stats', 'var', lambda: jnp.ones(C, jnp.float32))
        scale = self.param('scale', nn.initializers.ones, (C,))
        bias = self.param('bias', nn.initializers.zeros, (C,))

        g = BN_STAT_GROUPS if not self.is_initializing() else 1
        if train and g > 1 and x.shape[0] % g == 0:
            # per-device-stats emulation: normalize each batch group with its
            # own statistics; running stats track group 0 (torch DataParallel
            # keeps the device-0 module's buffers).
            x = x.astype(jnp.float32)
            B = x.shape[0]
            xg = x.reshape(g, B // g, *x.shape[1:])
            red = tuple(range(1, xg.ndim - 1))
            mean = jnp.mean(xg, axis=red)                       # (g, C)
            bshape = (g,) + (1,) * (xg.ndim - 2) + (C,)
            var = jnp.mean(jnp.square(xg - mean.reshape(bshape)), axis=red)
            n = B // g
            for d in red[1:]:
                n *= xg.shape[d]
            unbiased = var * (n / max(n - 1, 1))
            m = jnp.asarray(momentum, jnp.float32)
            ra_mean.value = (1 - m) * ra_mean.value + m * mean[0].astype(jnp.float32)
            ra_var.value = (1 - m) * ra_var.value + m * unbiased[0].astype(jnp.float32)
            inv = jax.lax.rsqrt(var.reshape(bshape).astype(x.dtype) + self.eps)
            out = (xg - mean.reshape(bshape).astype(x.dtype)) * inv
            return (out.reshape(x.shape) * scale + bias).astype(in_dtype)
        if train:
            red = tuple(range(x.ndim - 1))
            mean = jnp.mean(x, axis=red, dtype=jnp.float32)          # (C,) f32
            # two-pass variance: the E[x^2]-E[x]^2 form cancels catastrophically
            # for large activations and can go negative past eps -> rsqrt(NaN).
            # The centred square converts to f32 INSIDE the reduction fusion
            # (no f32 activation copy reaches HBM).
            diff = x - mean.astype(in_dtype)
            var = jnp.mean(jnp.square(diff.astype(jnp.float32)), axis=red)
            n = 1
            for d in red:
                n *= x.shape[d]
            unbiased = var * (n / max(n - 1, 1))
            if not self.is_initializing():
                m = jnp.asarray(momentum, jnp.float32)
                ra_mean.value = (1 - m) * ra_mean.value + m * mean
                ra_var.value = (1 - m) * ra_var.value + m * unbiased
        else:
            mean, var = ra_mean.value, ra_var.value
            diff = x - mean.astype(in_dtype)

        # fold inv*scale in f32 once per channel, then one bf16 (or f32)
        # multiply-add over the activation
        w = jax.lax.rsqrt(var + self.eps) * scale                    # (C,) f32
        return diff * w.astype(in_dtype) + bias.astype(in_dtype)


class PointwiseConv(nn.Module):
    """Dense applied over the channel (last) axis — the 1x1 Conv1d/Conv2d of
    the reference (pytorch_utils.py:35-235) expressed as an MXU matmul."""

    features: int
    bn: bool = True
    activation: bool = True
    kernel_init: Callable = kaiming_normal()
    dtype: Any = None  # bf16 for mixed precision; params stay f32

    @nn.compact
    def __call__(self, x, train: bool = False, bn_momentum=0.1):
        x = nn.Dense(self.features, use_bias=not self.bn,
                     kernel_init=self.kernel_init, dtype=self.dtype)(x)
        if self.bn:
            x = BatchNorm()(x, train=train, momentum=bn_momentum)
        if self.activation:
            x = nn.relu(x)
        return x


class SharedMLP(nn.Module):
    """Stack of PointwiseConv blocks (pytorch_utils.py:5-32)."""

    features: Sequence[int]
    bn: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False, bn_momentum=0.1):
        for f in self.features:
            x = PointwiseConv(f, bn=self.bn, dtype=self.dtype)(
                x, train=train, bn_momentum=bn_momentum)
        return x


class _Conv3x3(nn.Module):
    """nn.Conv-compatible 3x3 SAME conv backed by ops/conv2d.py (barriered
    backward, see its module docstring); param layout matches nn.Conv
    exactly."""

    features: int
    stride: int = 2
    kernel_init: Callable = kaiming_normal()
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        from ..ops.conv2d import conv3x3_same
        C = x.shape[-1]
        kernel = self.param('kernel', self.kernel_init,
                            (3, 3, C, self.features))
        dt = self.dtype or x.dtype
        return conv3x3_same(x.astype(dt), kernel.astype(dt), self.stride)


class _ConvStem(nn.Module):
    """nn.Conv-compatible 3x3 s1 SAME conv for tiny C_in, backed by the
    im2col dot (ops/conv2d.py:conv3x3_s1_im2col); param layout matches
    nn.Conv exactly."""

    features: int
    kernel_init: Callable = kaiming_normal()
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        from ..ops.conv2d import conv3x3_s1_im2col
        C = x.shape[-1]
        kernel = self.param('kernel', self.kernel_init,
                            (3, 3, C, self.features))
        dt = self.dtype or x.dtype
        return conv3x3_s1_im2col(x.astype(dt), kernel.astype(dt))


class Conv2dBlock(nn.Module):
    """NHWC KxK conv (+ optional BN/ReLU) for the image stream."""

    features: int
    kernel: int = 3
    stride: int = 1
    bn: bool = False
    activation: bool = False
    use_bias: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False, bn_momentum=0.1):
        from ..ops.conv2d import (conv3x3_same_available,
                                  stem_im2col_available)
        if (not self.use_bias and train
                and stem_im2col_available(x.shape, self.kernel, self.stride)):
            # RGB stem, TRAIN only: im2col dot so the weight grad is one
            # MXU contraction (ops/conv2d.py:conv3x3_s1_im2col); param
            # path kept at Conv_0/kernel. At eval the lax conv forward is
            # ~3.7 ms/B8 faster (bench A/B: 104.8 vs 100.0 scans/s) and
            # there is no weight grad to fix, so eval keeps lax. NB: the
            # two lowerings agree to 2e-5 in f32 (tests/test_conv2d.py)
            # but only approximately under bf16 — BN running stats are
            # collected on the im2col forward while eval uses lax; if eval
            # metrics ever look off, A/B with EPNET_STEM_IM2COL=0.
            x = _ConvStem(self.features, kernel_init=kaiming_normal(),
                          dtype=self.dtype, name='Conv_0')(x)
        elif (not self.use_bias
                and conv3x3_same_available(x.shape, self.kernel,
                                           self.stride)):
            # tower conv with the barriered backward (ops/conv2d.py); same
            # values, param path kept at Conv_0/kernel
            x = _Conv3x3(self.features, stride=self.stride,
                         kernel_init=kaiming_normal(),
                         dtype=self.dtype, name='Conv_0')(x)
        else:
            x = nn.Conv(self.features, (self.kernel, self.kernel),
                        strides=(self.stride, self.stride), padding='SAME',
                        use_bias=self.use_bias, kernel_init=kaiming_normal(),
                        dtype=self.dtype)(x)
        if self.bn:
            x = BatchNorm()(x, train=train, momentum=bn_momentum)
        if self.activation:
            x = nn.relu(x)
        return x
