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
from jax.experimental.pallas import tpu as pltpu

# Both kernel families accumulate a shared VMEM output block across every
# grid step, which requires the TPU's sequential ('arbitrary') grid
# semantics — made explicit via dimension_semantics below; a parallel grid
# would be a data race (advisor r2).
_SEQ2 = pltpu.CompilerParams(dimension_semantics=('arbitrary', 'arbitrary'))
_SEQ3 = pltpu.CompilerParams(
    dimension_semantics=('arbitrary', 'arbitrary', 'arbitrary'))


# ---------------------------------------------------------------------------
# Stacked-shift kernels: all 9 slots in ONE MXU dot per tile.
#
# s1:  dK[di, dj] = sum_hw x[h + di - 1, w] * dy[h, w - dj + 1], so with
#      U[h, w, di*C + c] = x[h + di - 1, w, c]   (3 row-shifted x stacks)
#      V[h, w, dj*F + f] = dy[h, w - dj + 1, f]  (3 col-shifted dy stacks)
#      the whole 3x3 weight grad is U^T V -> (3C, 3F): one
#      (tm*W, 3C) x (tm*W, 3F) contraction — 9x larger M/N than the
#      per-slot dots (MXU-shaped at C >= 64) with ZERO extra FLOPs.
# s2:  dK[p + 2a, q + 2b] = sum x_phase[p, q] * dy[h - a, w - b]:
#      U = space-to-depth x (4C), V = 4 row/col-shifted dy stacks (4F),
#      one (4C, 4F) dot; the 7 (p+2a > 2 | q+2b > 2) slots are dropped.
#
# Large C*F blocks chunk F via a third (innermost) grid dim: x's block
# index map is constant across it so the x tile is fetched once per row
# tile, while dy chunks stream.
# ---------------------------------------------------------------------------


def _dw_s1_stack_kernel(x_ref, xp_ref, xn_ref, dy_ref, out_ref, *, tm, nt):
    b = pl.program_id(1)
    t = pl.program_id(2)

    @pl.when((b == 0) & (t == 0))
    def _init():
        out_ref[...] = jnp.zeros(out_ref.shape, out_ref.dtype)

    xt = x_ref[0]                                   # (tm, W, C)
    dy = dy_ref[0]                                  # (tm, W, Fc)
    W = xt.shape[1]
    Fc = dy.shape[2]
    prv = jnp.where(t > 0, xp_ref[0], jnp.zeros_like(xp_ref[0]))       # (1, W, C)
    nxt = jnp.where(t < nt - 1, xn_ref[0], jnp.zeros_like(xn_ref[0]))
    U = jnp.concatenate([
        jnp.concatenate([prv, xt[:tm - 1]], axis=0),    # x[h-1]  (di = 0)
        xt,                                             # di = 1
        jnp.concatenate([xt[1:], nxt], axis=0),         # x[h+1]  (di = 2)
    ], axis=2)                                          # (tm, W, 3C)
    zc = jnp.zeros((tm, 1, Fc), dy.dtype)
    V = jnp.concatenate([
        jnp.concatenate([dy[:, 1:], zc], axis=1),       # dy[w+1] (dj = 0)
        dy,                                             # dj = 1
        jnp.concatenate([zc, dy[:, :W - 1]], axis=1),   # dy[w-1] (dj = 2)
    ], axis=2)                                          # (tm, W, 3Fc)
    C3 = U.shape[2]
    out_ref[...] = out_ref[...] + _dot_rr(
        U.reshape(tm * W, C3), V.reshape(tm * W, 3 * Fc))


def dw3x3_s1_stack(x, dy, tm=8, f_chunk=None, interpret=False):
    """Weight grad of a 3x3 stride-1 SAME conv via one (3C, 3F) dot per
    row tile: x (B, H, W, C), dy (B, H, W, F) -> (3, 3, C, F) f32."""
    B, H, W, C = x.shape
    F = dy.shape[-1]
    assert dy.shape[:3] == (B, H, W), (x.shape, dy.shape)
    assert H % tm == 0, (H, tm)
    nt = H // tm
    Fc = f_chunk or F
    assert F % Fc == 0, (F, Fc)
    nf = F // Fc
    kernel = functools.partial(_dw_s1_stack_kernel, tm=tm, nt=nt)
    # f OUTERMOST: each (3C, 3Fc) accumulator block stays VMEM-resident for
    # its whole (b, t) sweep and is written back exactly once — out-block
    # revisiting (f innermost) silently dropped accumulation on the real
    # backend. Cost: x is re-read nf times (nf <= 4, x is the small side).
    out = pl.pallas_call(
        kernel,
        grid=(nf, B, nt),
        in_specs=[
            pl.BlockSpec((1, tm, W, C), lambda f, b, t: (b, t, 0, 0)),
            # 1-row neighbor fetches (prev-last / next-first row only)
            pl.BlockSpec((1, 1, W, C),
                         lambda f, b, t: (b, jnp.maximum(t * tm - 1, 0), 0, 0)),
            pl.BlockSpec((1, 1, W, C),
                         lambda f, b, t: (b, jnp.minimum(t * tm + tm, nt * tm - 1), 0, 0)),
            pl.BlockSpec((1, tm, W, Fc), lambda f, b, t: (b, t, 0, f)),
        ],
        out_specs=pl.BlockSpec((1, 3 * C, 3 * Fc), lambda f, b, t: (f, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((nf, 3 * C, 3 * Fc), jnp.float32),
        compiler_params=_SEQ3,
        interpret=interpret,
    )(x, x, x, dy)
    # out[f, di*C + c, dj*Fc + fc] -> dK[di, dj, c, f*Fc + fc]
    out = out.reshape(nf, 3, C, 3, Fc).transpose(1, 3, 2, 0, 4)
    return out.reshape(3, 3, C, F)


_VMEM_BUDGET = 10 << 20  # leave headroom under the ~16 MB VMEM limit


def pick_s1_params(H, W, C, F, itemsize=2):
    """Largest (tm, f_chunk) whose VMEM footprint fits the budget, or None."""
    for fc in [f for f in (F, 256, 128) if f == F or (f % 128 == 0 and F % f == 0 and f < F)]:
        for tm in (8, 4, 2):
            if H % tm:
                continue
            need = (2 * tm * W * C + 2 * tm * W * fc
                    + tm * W * 3 * C + tm * W * 3 * fc) * itemsize \
                + 9 * C * fc * 4
            if need <= _VMEM_BUDGET:
                return tm, fc
    return None


def pick_s2_params(H, W, C, F, itemsize=2):
    H2, W2 = H // 2, W // 2
    for fc in [f for f in (F, 256, 128) if f == F or (f % 128 == 0 and F % f == 0 and f < F)]:
        for tm in (8, 4, 2):
            if H2 % tm:
                continue
            need = (2 * 2 * tm * W * C + 2 * tm * W2 * fc
                    + tm * W2 * 4 * C + tm * W2 * 4 * fc) * itemsize \
                + 16 * C * fc * 4
            if need <= _VMEM_BUDGET:
                return tm, fc
    return None


def _dw_s2_stack_kernel(x_ref, dy_ref, dyp_ref, out_ref, u_ref, v_ref, *,
                        tm, W2):
    b = pl.program_id(1)
    t = pl.program_id(2)

    @pl.when((b == 0) & (t == 0))
    def _init():
        out_ref[...] = jnp.zeros(out_ref.shape, out_ref.dtype)

    xt = x_ref[0]                                   # (2tm, W, C)
    C = xt.shape[2]
    dy = dy_ref[0]                                  # (tm, W2, Fc)
    Fc = dy.shape[2]
    # space-to-depth via phase slices staged through a VMEM scratch:
    # U[h, w, (p*2 + q)*C + c] = x[2h + p, 2w + q, c]. A direct lane-dim
    # jnp.concatenate of the phase slices fails to compile (Mosaic
    # "offset mismatch on non-concat dimension" — the q = 1 slices carry
    # a sublane offset); stores to static lane ranges sidestep it.
    xrows = xt.reshape(tm, 2, xt.shape[1], C)
    for p in range(2):
        cols = xrows[:, p].reshape(tm, W2, 2, C)
        for q in range(2):
            u_ref[:, :, (p * 2 + q) * C:(p * 2 + q + 1) * C] = cols[:, :, q]
    prv = jnp.where(t > 0, dyp_ref[0], jnp.zeros_like(dyp_ref[0]))  # (1, W2, Fc)
    dy_dn = jnp.concatenate([prv, dy[:tm - 1]], axis=0)             # dy[h-1]
    zc = jnp.zeros((tm, 1, Fc), dy.dtype)

    def shr(d):                                     # dy[w-1]
        return jnp.concatenate([zc, d[:, :W2 - 1]], axis=1)

    # V[h, w, (a*2 + b)*Fc + f] = dy[h - a, w - b, f]
    v_ref[:, :, 0 * Fc:1 * Fc] = dy
    v_ref[:, :, 1 * Fc:2 * Fc] = shr(dy)
    v_ref[:, :, 2 * Fc:3 * Fc] = dy_dn
    v_ref[:, :, 3 * Fc:4 * Fc] = shr(dy_dn)
    out_ref[...] = out_ref[...] + _dot_rr(
        u_ref[...].reshape(tm * W2, 4 * C), v_ref[...].reshape(tm * W2, 4 * Fc))


def dw3x3_s2_stack(x, dy, tm=8, f_chunk=None, interpret=False):
    """Weight grad of a 3x3 stride-2 SAME conv (even H, W) via one
    (4C, 4F) dot per row tile: x (B, H, W, C), dy (B, H/2, W/2, F)
    -> (3, 3, C, F) f32."""
    B, H, W, C = x.shape
    F = dy.shape[-1]
    H2, W2 = H // 2, W // 2
    assert W % 2 == 0 and H % 2 == 0, (H, W)
    assert dy.shape[:3] == (B, H2, W2), (x.shape, dy.shape)
    assert H2 % tm == 0, (H2, tm)
    nt = H2 // tm
    Fc = f_chunk or F
    assert F % Fc == 0, (F, Fc)
    nf = F // Fc
    kernel = functools.partial(_dw_s2_stack_kernel, tm=tm, W2=W2)
    out = pl.pallas_call(
        kernel,
        grid=(nf, B, nt),           # f outermost — see dw3x3_s1_stack
        in_specs=[
            pl.BlockSpec((1, 2 * tm, W, C), lambda f, b, t: (b, t, 0, 0)),
            pl.BlockSpec((1, tm, W2, Fc), lambda f, b, t: (b, t, 0, f)),
            # prev tile's last dy row for the a = 1 shift
            pl.BlockSpec((1, 1, W2, Fc),
                         lambda f, b, t: (b, jnp.maximum(t * tm - 1, 0), 0, f)),
        ],
        out_specs=pl.BlockSpec((1, 4 * C, 4 * Fc), lambda f, b, t: (f, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((nf, 4 * C, 4 * Fc), jnp.float32),
        scratch_shapes=[pltpu.VMEM((tm, W2, 4 * C), x.dtype),
                        pltpu.VMEM((tm, W2, 4 * Fc), dy.dtype)],
        compiler_params=_SEQ3,
        interpret=interpret,
    )(x, dy, dy)
    # out[f, (p*2 + q)*C + c, (a*2 + b)*Fc + fc] -> dK[p + 2a, q + 2b, c, f]
    out = out.reshape(nf, 2, 2, C, 2, 2, Fc)
    dk = jnp.zeros((3, 3, C, F), jnp.float32)
    for p in range(2):
        for q in range(2):
            for a in range(2):
                for bb in range(2):
                    di, dj = p + 2 * a, q + 2 * bb
                    if di > 2 or dj > 2:
                        continue
                    piece = out[:, p, q, :, a, bb].transpose(1, 0, 2).reshape(C, F)
                    dk = dk.at[di, dj].set(piece)
    return dk


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
