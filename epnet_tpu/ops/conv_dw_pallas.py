"""Pallas weight-gradient kernels for the image tower's 3x3 convs.

XLA's weight-grad lowering for the tower's convs costs ~10 ms/block at
train shapes (tools/profile_imgblock_bwd.py) — an order of magnitude over
both the MXU math and the HBM traffic. The round-2 grid-slot Pallas
attempt (conv2d._dw_pallas) kept the 9 kernel slots as a *grid* dimension
to bound VMEM, paying dynamic predicated selects on every step (41 ms).

These kernels instead unroll the slot loop *inside* the body with static
Python indices: every phase extraction and row/col shift is a static
slice, the x/dy tiles are fetched once per row-tile, and all 9 (C, F)
f32 accumulators live in the VMEM output block across the whole grid.

Two variants share the structure (grid = (B, H/tile) with the output
revisited every step):

* stride 1 (SAME): dK[di, dj] = sum_hw x[h, w] dy[h-(di-1), w-(dj-1)].
  Row shifts across tile boundaries come from passing the dy tile three
  times (prev/cur/next); col shifts are in-tile concats with a zero edge.
* stride 2 (SAME, even H and W): with dy = 2a+p the strided correlation
  factors into phase views of x (static (2, 2) slices of the row/col
  pairs) against (a, b)-shifted dy — the same decomposition as
  conv2d._bwd's 4-shift einsum, but evaluated tile-wise in VMEM.

Reference counterpart: torch autograd's cudnn weight grad for the
BasicBlock convs (lib/net/pointnet2_msg.py:17-33).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl


def _dot_rr(a, b):
    """(R, C) x (R, F) -> (C, F), f32 accumulation on the MXU."""
    return lax.dot_general(a, b, (((0,), (0,)), ((), ())),
                           preferred_element_type=jnp.float32)


def _dw_s1_kernel(x_ref, dyp_ref, dyc_ref, dyn_ref, out_ref, *, tm, nt):
    b = pl.program_id(0)
    t = pl.program_id(1)

    @pl.when((b == 0) & (t == 0))
    def _init():
        out_ref[...] = jnp.zeros(out_ref.shape, out_ref.dtype)

    xt = x_ref[0]                                   # (tm, W, C)
    dyc = dyc_ref[0]                                # (tm, W, F)
    W = xt.shape[1]
    C = xt.shape[2]
    F = dyc.shape[2]

    # dy rows h - r for r in {-1, 0, +1}; tiles are row-contiguous so the
    # r = -1 row tm-1 comes from the next tile's first row and the r = +1
    # row 0 from the previous tile's last row (zero at the image edge).
    nxt = jnp.where(t < nt - 1, dyn_ref[0, :1], jnp.zeros_like(dyn_ref[0, :1]))
    prv = jnp.where(t > 0, dyp_ref[0, tm - 1:tm],
                    jnp.zeros_like(dyp_ref[0, :1]))
    rows = {
        -1: jnp.concatenate([dyc[1:], nxt], axis=0),
        0: dyc,
        1: jnp.concatenate([prv, dyc[:tm - 1]], axis=0),
    }
    zcol = jnp.zeros((tm, 1, F), dyc.dtype)
    xr = xt.reshape(tm * W, C)
    for di in range(3):
        dyr = rows[di - 1]
        for dj in range(3):
            if dj == 0:
                dv = jnp.concatenate([dyr[:, 1:], zcol], axis=1)
            elif dj == 1:
                dv = dyr
            else:
                dv = jnp.concatenate([zcol, dyr[:, :W - 1]], axis=1)
            s = di * 3 + dj
            out_ref[s] = out_ref[s] + _dot_rr(xr, dv.reshape(tm * W, F))


def dw3x3_s1_pallas(x, dy, tm=8, interpret=False):
    """Weight grad of a 3x3 stride-1 SAME conv: x (B, H, W, C),
    dy (B, H, W, F) -> (3, 3, C, F) f32."""
    B, H, W, C = x.shape
    F = dy.shape[-1]
    assert H % tm == 0, (H, tm)
    nt = H // tm
    kernel = functools.partial(_dw_s1_kernel, tm=tm, nt=nt)
    out = pl.pallas_call(
        kernel,
        grid=(B, nt),
        in_specs=[
            pl.BlockSpec((1, tm, W, C), lambda b, t: (b, t, 0, 0)),
            pl.BlockSpec((1, tm, W, F), lambda b, t: (b, jnp.maximum(t - 1, 0), 0, 0)),
            pl.BlockSpec((1, tm, W, F), lambda b, t: (b, t, 0, 0)),
            pl.BlockSpec((1, tm, W, F),
                         lambda b, t: (b, jnp.minimum(t + 1, nt - 1), 0, 0)),
        ],
        out_specs=pl.BlockSpec((9, C, F), lambda b, t: (0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((9, C, F), jnp.float32),
        interpret=interpret,
    )(x, dy, dy, dy)
    return out.reshape(3, 3, C, F)


def _dw_s2_kernel(x_ref, dyc_ref, dyp_ref, out_ref, *, tm, W2):
    b = pl.program_id(0)
    t = pl.program_id(1)

    @pl.when((b == 0) & (t == 0))
    def _init():
        out_ref[...] = jnp.zeros(out_ref.shape, out_ref.dtype)

    xt = x_ref[0]                                   # (2tm, W, C)
    C = xt.shape[2]
    dyc = dyc_ref[0]                                # (tm, W2, F)
    F = dyc.shape[2]
    xp = xt.reshape(tm, 2, W2, 2, C)
    # dy shifted down one row (a = 1, i.e. di = 2): previous tile's last row
    prv = jnp.where(t > 0, dyp_ref[0, tm - 1:tm],
                    jnp.zeros_like(dyp_ref[0, :1]))
    dy_dn = jnp.concatenate([prv, dyc[:tm - 1]], axis=0)
    zcol = jnp.zeros((tm, 1, F), dyc.dtype)

    def shr(d):  # dy shifted right one col (b = 1, i.e. dj = 2)
        return jnp.concatenate([zcol, d[:, :W2 - 1]], axis=1)

    dys = {(0, 0): dyc, (0, 1): shr(dyc), (1, 0): dy_dn, (1, 1): shr(dy_dn)}
    for a, p in ((0, 0), (0, 1), (1, 0)):
        for bb, q in ((0, 0), (0, 1), (1, 0)):
            xq = xp[:, p, :, q].reshape(tm * W2, C)
            dv = dys[(a, bb)].reshape(tm * W2, F)
            s = (2 * a + p) * 3 + (2 * bb + q)
            out_ref[s] = out_ref[s] + _dot_rr(xq, dv)


def dw3x3_s2_pallas(x, dy, tm=4, interpret=False):
    """Weight grad of a 3x3 stride-2 SAME conv (even H, W):
    x (B, H, W, C), dy (B, H/2, W/2, F) -> (3, 3, C, F) f32."""
    B, H, W, C = x.shape
    H2, W2 = H // 2, W // 2
    F = dy.shape[-1]
    assert H2 % tm == 0, (H2, tm)
    nt = H2 // tm
    kernel = functools.partial(_dw_s2_kernel, tm=tm, W2=W2)
    out = pl.pallas_call(
        kernel,
        grid=(B, nt),
        in_specs=[
            pl.BlockSpec((1, 2 * tm, W, C), lambda b, t: (b, t, 0, 0)),
            pl.BlockSpec((1, tm, W2, F), lambda b, t: (b, t, 0, 0)),
            pl.BlockSpec((1, tm, W2, F),
                         lambda b, t: (b, jnp.maximum(t - 1, 0), 0, 0)),
        ],
        out_specs=pl.BlockSpec((9, C, F), lambda b, t: (0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((9, C, F), jnp.float32),
        interpret=interpret,
    )(x, dy, dy)
    return out.reshape(3, 3, C, F)
