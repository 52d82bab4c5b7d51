"""3x3 stride-2 SAME convolution with a TPU-friendly backward.

The image tower's downsampling convs (reference BasicBlock,
``lib/net/pointnet2_msg.py:17-33``) dominate the training backward: XLA's
weight-gradient for a strided conv costs ~13.5 ms at the 384x1280x64
block vs ~3 ms of MXU math (tools/profile_s2conv.py). The forward and the
input-gradient lowerings are fine; only the weight grad is replaced.

Weight grad via space-to-depth phase decomposition: with even H, W and
XLA SAME padding (pad_lo=0, pad_hi=1), ``y[h'] = sum_dy x[2h'+dy] K[dy]``,
and writing dy = 2a+p (a, p in {0,1}) turns the strided 3x3 correlation
into four *unstrided* full-tensor contractions over the half-res
space-to-depth view:

    dK[2a+p, 2b+q] = einsum('bhwc,bhwf->cf', s2d(x)[., h+a, w+b, (p,q,.)], dy)

i.e. one (4C, B*H2*W2) @ (B*H2*W2, F) matmul per (a, b) shift — plain
MXU reductions with no window striding. The (a,b,p,q) -> 3x3 slot map is
injective; slot (1,1) per axis falls outside the kernel and is dropped.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _conv_s2(x: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    return jax.lax.conv_general_dilated(
        x, w, (2, 2), 'SAME', dimension_numbers=('NHWC', 'HWIO', 'NHWC'))


@jax.custom_vjp
def conv3x3_stride2(x: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """x (B, H, W, C) with even H, W; w (3, 3, C, F). SAME padding,
    stride 2 — identical values to ``lax.conv_general_dilated``."""
    return _conv_s2(x, w)


def _fwd(x, w):
    return _conv_s2(x, w), (x, w)


def _bwd(res, dy):
    x, w = res
    B, H, W, C = x.shape
    F = w.shape[-1]
    H2, W2 = H // 2, W // 2

    # input grad: XLA's transposed-conv lowering is already good
    _, pull = jax.vjp(lambda xx: _conv_s2(xx, w), x)
    dx, = pull(dy)

    # weight grad: 4-shift matmuls over the space-to-depth view
    xs = x.reshape(B, H2, 2, W2, 2, C).transpose(0, 1, 3, 2, 4, 5)
    xs = xs.reshape(B, H2, W2, 4 * C)
    xs = jnp.pad(xs, ((0, 0), (0, 1), (0, 1), (0, 0)))
    dw4 = []
    for a in range(2):
        for b in range(2):
            win = jax.lax.dynamic_slice(
                xs, (0, a, b, 0), (B, H2, W2, 4 * C))
            dw4.append(jnp.einsum(
                'bhwk,bhwf->kf', win, dy,
                preferred_element_type=jnp.float32))
    # (2a, 2b, (p, q, C), F) -> K4[2a+p, 2b+q, C, F] -> keep the 3x3 window
    k4 = jnp.stack(dw4).reshape(2, 2, 2, 2, C, F)
    k4 = k4.transpose(0, 2, 1, 3, 4, 5).reshape(4, 4, C, F)
    dw = k4[:3, :3].astype(w.dtype)
    return dx, dw


conv3x3_stride2.defvjp(_fwd, _bwd)


def conv3x3_stride2_available(x_shape, kernel: int, stride: int) -> bool:
    return (kernel == 3 and stride == 2
            and x_shape[1] % 2 == 0 and x_shape[2] % 2 == 0)
