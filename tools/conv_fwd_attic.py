"""ATTIC — replacement forwards for the tower's 3x3 stride-2 convs; both
LOSE to XLA's own strided lowering on the real chip and neither ships
(tools/profile_fwd_pallas.py, 2026-08-20): the Pallas row-tile kernel
exceeds v5e's 16 MB scoped VMEM at compile (phase-split intermediates
tile to 79 MB), and the space-to-depth 2x2-conv reformulation measures
blk0 6.18 vs 5.04 ms, blk1 3.22 vs 1.34, blk2 0.85 vs 0.31. Kept with
the numbers so the negative result isn't re-explored.

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
    W = xt.shape[1]
    # x row 2*(t+1)*tm — the d=2 tap of the tile's last output row; at the
    # image bottom that row is SAME padding (zero).
    xn = jnp.where(t < nt - 1, xn_ref[0], jnp.zeros_like(xn_ref[0]))

    # Row-phase extraction via reshape (a strided slice on a value lowers
    # as a >2D gather, which Mosaic rejects — same trick as _dw_pallas).
    xr = xt.reshape(tm, 2, W, C)
    r0 = xr[:, 0]                                   # rows 2h
    r1 = xr[:, 1]                                   # rows 2h + 1
    r2 = jnp.concatenate([r0[1:], xn], axis=0)      # rows 2h + 2

    zc = None
    for d, rows in ((0, r0), (1, r1), (2, r2)):
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


def conv3x3_s2_fwd_s2d(x, w):
    """3x3 stride-2 SAME conv as a 2x2 stride-1 conv over space-to-depth
    phase planes — pure XLA, no Pallas.

    With even H, W and tap index d = 2a + p (a = d//2, p = d%2):

        y[h, w] = sum_{d,e} x[2h+d, 2w+e] K[d, e]
                = sum_{a,b,p,q} xs_pq[h+a, w+b] K[2a+p, 2b+q]

    where ``xs_pq[h, w] = x[2h+p, 2w+q]``. So the strided conv is EXACTLY a
    dense 2x2 unit-stride conv over the (p, q)-stacked 4C-channel image,
    with the (a=1, p=1) kernel slices zero (d=3 doesn't exist). XLA's
    unit-stride conv lowering tiles straight onto the MXU; its strided
    lowering at the blk0 shape measures ~4.9 ms vs a ~0.7 ms roofline
    (module docstring), while this form pays only the space-to-depth copy
    (2x HBM traffic of x) + 16/9 extra MACs on zero taps."""
    B, H, W, C = x.shape
    F = w.shape[-1]
    assert w.shape[:3] == (3, 3, C), (x.shape, w.shape)
    assert H % 2 == 0 and W % 2 == 0, (H, W)
    H2, W2 = H // 2, W // 2
    xs = x.reshape(B, H2, 2, W2, 2, C).transpose(0, 1, 3, 2, 4, 5)
    xs = xs.reshape(B, H2, W2, 4 * C)
    # K2[a, b, (p q c), f] = K[2a+p, 2b+q, c, f]; d=3/e=3 taps are zero
    z = jnp.zeros_like(w[0, 0])
    rows = {}
    for a in (0, 1):
        for p in (0, 1):
            d = 2 * a + p
            for b in (0, 1):
                for q in (0, 1):
                    e = 2 * b + q
                    rows[(a, b, p, q)] = w[d, e] if d < 3 and e < 3 else z
    k2 = jnp.stack([
        jnp.stack([
            jnp.concatenate([rows[(a, b, p, q)]
                             for p in (0, 1) for q in (0, 1)], axis=0)
            for b in (0, 1)], axis=0)
        for a in (0, 1)], axis=0)                   # (2, 2, 4C, F)
    return lax.conv_general_dilated(
        xs, k2, (1, 1), [(0, 1), (0, 1)],
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'))


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
