"""Pallas forward kernel for the image tower's 3x3 stride-2 SAME convs.

XLA's strided-conv forward at the blk0 train shape (B4, 384x1280, 64ch,
bf16) measures ~4.9 ms against a ~0.7 ms roofline (0.37 ms MXU at the
N=64 half-lane ceiling + 0.3 ms HBM for x) — tools/profile_conv_fix2.py
rules out producer fusion (input barrier changes nothing); the lowering
itself is the floor. Deeper s2 convs (128-512 ch at lower resolution) are
already near-roofline under XLA (tools/profile_tower_convs.py), so this
kernel is gated to the shapes where it wins.

Formulation: with even H, W and XLA SAME padding (pad_lo=0, pad_hi=1),

    y[h, w, f] = sum_{d,e in 0..2} x[2h + d, 2w + e, c] K[d, e, c, f]

Each tap (d, e) is a stride-2 phase view of x, so a row tile of y needs
x rows [2*t*tm, 2*(t+1)*tm] (one extra row for d=2) and the whole 3x3
window stacks into U[h, w, (d, e, c)] — ONE (tm*W2, 9C) x (9C, F) MXU
dot per row tile with zero extra FLOPs. Phase extraction uses static-
lane-range stores into a VMEM scratch (jnp.concatenate on the lane dim
fails Mosaic legalization for phase slices — see dw3x3_s2_stack).

Reference counterpart: the BasicBlock downsampling convs,
lib/net/pointnet2_msg.py:17-33.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _fwd_s2_kernel(x_ref, xn_ref, w_ref, out_ref, u_ref, *, tm, W2, nt):
    t = pl.program_id(1)

    xt = x_ref[0]                                   # (2tm, W, C)
    C = xt.shape[2]
    # x row 2*(t+1)*tm — the d=2 tap of the tile's last output row; at the
    # image bottom that row is SAME padding (zero).
    xn = jnp.where(t < nt - 1, xn_ref[0], jnp.zeros_like(xn_ref[0]))
    xrows = jnp.concatenate([xt, xn], axis=0)       # (2tm + 1, W, C)

    zc = None
    for d in range(3):
        rows = xrows[d:d + 2 * tm:2] if d < 2 else xrows[2:2 * tm + 1:2]
        # rows: (tm, W, C) = x[2h + d] for the tile's h range
        pairs = rows.reshape(tm, W2, 2, C)
        ph0, ph1 = pairs[:, :, 0], pairs[:, :, 1]   # cols 2w / 2w + 1
        if zc is None:
            zc = jnp.zeros((tm, 1, C), xt.dtype)
        # cols 2w + 2 = phase 0 shifted left one pair; w = W2-1 reads pad
        ph2 = jnp.concatenate([ph0[:, 1:], zc], axis=1)
        for e, ph in ((0, ph0), (1, ph1), (2, ph2)):
            k = d * 3 + e
            u_ref[:, :, k * C:(k + 1) * C] = ph

    acc = lax.dot_general(
        u_ref[...].reshape(tm * W2, 9 * C), w_ref[...],
        (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    out_ref[0] = acc.reshape(tm, W2, -1).astype(out_ref.dtype)


_VMEM_BUDGET = 10 << 20


def pick_fwd_s2_tm(H, W, C, F, itemsize=2):
    """Largest row-tile whose VMEM footprint fits, or None."""
    H2, W2 = H // 2, W // 2
    for tm in (16, 8, 4, 2):
        if H2 % tm:
            continue
        need = (2 * (2 * tm + 1) * W * C       # x tile + neighbor (dbl buf)
                + 2 * tm * W2 * F              # out tile
                + tm * W2 * 9 * C) * itemsize \
            + 9 * C * F * itemsize + tm * W2 * F * 4
        if need <= _VMEM_BUDGET:
            return tm
    return None


def conv3x3_s2_fwd_pallas(x, w, tm=None, interpret=False):
    """3x3 stride-2 SAME conv forward: x (B, H, W, C) with even H, W;
    w (3, 3, C, F) -> (B, H/2, W/2, F), x.dtype. Same values as
    ``lax.conv_general_dilated`` (bf16 operands, f32 MXU accumulation)."""
    B, H, W, C = x.shape
    F = w.shape[-1]
    assert w.shape[:3] == (3, 3, C), (x.shape, w.shape)
    assert H % 2 == 0 and W % 2 == 0, (H, W)
    H2, W2 = H // 2, W // 2
    tm = tm or pick_fwd_s2_tm(H, W, C, F)
    assert tm is not None and H2 % tm == 0, (H2, tm)
    nt = H2 // tm
    kernel = functools.partial(_fwd_s2_kernel, tm=tm, W2=W2, nt=nt)
    out = pl.pallas_call(
        kernel,
        grid=(B, nt),
        in_specs=[
            pl.BlockSpec((1, 2 * tm, W, C), lambda b, t: (b, t, 0, 0)),
            # one extra x row (2*(t+1)*tm) for the d=2 taps; clamped at the
            # bottom edge and zeroed in-kernel
            pl.BlockSpec((1, 1, W, C),
                         lambda b, t: (b, jnp.minimum((t + 1) * 2 * tm,
                                                      2 * nt * tm - 1), 0, 0)),
            pl.BlockSpec((9 * C, F), lambda b, t: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, tm, W2, F), lambda b, t: (b, t, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, H2, W2, F), x.dtype),
        scratch_shapes=[pltpu.VMEM((tm, W2, 9 * C), x.dtype)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=('parallel', 'parallel')),
        interpret=interpret,
    )(x, x, w.reshape(9 * C, F))
    return out
