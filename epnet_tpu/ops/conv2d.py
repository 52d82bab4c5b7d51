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

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


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


def _dw_kernel(x_ref, dyA_ref, dyB_ref, out_ref, *, tm, W2):
    """One (batch, row-tile, slot) step: accumulate kernel slot
    s = di*3+dj of the x tile against the dy tile. The slot is the
    innermost grid dim so the x block stays VMEM-resident across all 9
    slots (fetched once per tile) while the per-step stack holds only one
    slot's operands — a fully unrolled slot loop blows the 16 MB scoped
    VMEM limit at the 384x1280 block. The (tiny) cotangent is passed
    twice: current tile + previous tile's last row for the dy=2 taps
    crossing the tile boundary."""
    b = pl.program_id(0)
    t = pl.program_id(1)
    s = pl.program_id(2)
    di = s // 3
    dj = s - di * 3

    @pl.when((b == 0) & (t == 0) & (s == 0))
    def _init():
        out_ref[...] = jnp.zeros(out_ref.shape, out_ref.dtype)

    xt = x_ref[0]                                  # (2tm, W, C)
    C = xt.shape[-1]
    F = out_ref.shape[-1]
    dyA = dyA_ref[0]                               # (tm, W2, F) — operand
    # dtype (bf16 under mixed precision); the dot accumulates in f32
    xp = xt.reshape(tm, 2, xt.shape[1], C)         # row phase p
    # dynamic_slice on values is unsupported by Mosaic, and bf16 scalar
    # arithmetic (arith.subf) fails to legalize — use predicated selects
    xv = jnp.where((di % 2) == 1, xp[:, 1], xp[:, 0])   # (tm, W, C)
    pairs = xv.reshape(tm, W2, 2, C)
    xq = jnp.where((dj % 2) == 1, pairs[:, :, 1], pairs[:, :, 0])

    # dy rows shifted down one (for di == 2): [prev tile's last row, :-1]
    prev_last = dyB_ref[0, tm - 1:tm]
    prev_last = jnp.where(t > 0, prev_last, jnp.zeros_like(prev_last))
    dyr = jnp.where(di < 2, dyA,
                    jnp.concatenate([prev_last, dyA[:tm - 1]], axis=0))
    # dy cols shifted right one (for dj == 2); w=0 tap falls off the image
    dv = jnp.where(dj < 2, dyr,
                   jnp.concatenate([jnp.zeros_like(dyr[:, :1]),
                                    dyr[:, :-1]], axis=1))

    acc = lax.dot_general(
        xq.reshape(tm * W2, C), dv.reshape(tm * W2, F),
        (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    out_ref[s] = out_ref[s] + acc


def _dw_pallas(x, dy, F, tm=4, interpret=False):
    B, H, W, C = x.shape
    H2, W2 = H // 2, W // 2
    grid = (B, H2 // tm, 9)
    kernel = functools.partial(_dw_kernel, tm=tm, W2=W2)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 2 * tm, W, C), lambda b, t, s: (b, t, 0, 0)),
            pl.BlockSpec((1, tm, W2, F), lambda b, t, s: (b, t, 0, 0)),
            pl.BlockSpec((1, tm, W2, F),
                         lambda b, t, s: (b, jnp.maximum(t - 1, 0), 0, 0)),
        ],
        out_specs=pl.BlockSpec((9, C, F), lambda b, t, s: (0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((9, C, F), jnp.float32),
        interpret=interpret,
    )(x, dy, dy)
    return out.reshape(3, 3, C, F)


def _dw_available(H2, C, F, tm=4):
    """Off by default: the kernel is *numerically better* than lax's bf16
    weight grad (f32 MXU accumulation: rel 3e-7 vs 2.6e-3 against an f32
    oracle) but measured 41 ms at the 384x1280 block — per-grid-step VMEM
    reshuffles (row/col phase selects of the x tile, 9 slots x 48 tiles)
    dominate; every restructuring modeled lands at the same ~10 ms
    multi-HBM-pass floor the XLA einsum fallback already hits. Enable
    with EPNET_PALLAS_DW=1 to iterate on it."""
    import os
    return (os.environ.get('EPNET_PALLAS_DW', '0') == '1'
            and H2 % tm == 0 and C * F <= 256 * 256
            and jax.default_backend() == 'tpu')


def _bwd(res, dy):
    x, w = res
    B, H, W, C = x.shape
    F = w.shape[-1]
    H2, W2 = H // 2, W // 2

    # input grad: XLA's transposed-conv lowering is already good
    _, pull = jax.vjp(lambda xx: _conv_s2(xx, w), x)
    dx, = pull(dy)

    if _dw_available(H2, C, F):
        dw = _dw_pallas(x, dy, F).astype(w.dtype)
        return dx, dw

    # fallback: 4-shift matmuls over the space-to-depth view
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
