"""3x3 SAME convolutions with a TPU-friendly backward for the image tower.

The image tower's convs (reference BasicBlock, ``lib/net/pointnet2_msg.py:
17-33``) dominate the training backward. The cost is NOT the gradient math:
at the blk0 train shape (B4, 384x1280, 64ch, bf16) XLA's own given-dy
dx+dw lowerings measure 1-3 ms even when loop-variant, yet the *joint*
grad-of-forward graph measures 15.6 ms (stride 2) / 19.9 ms (stride 1) —
an XLA fusion/layout pathology around the in-graph cotangent, independent
of cotangent dtype, mixed precision, or recompute
(tools/profile_s2bwd_variants.py variants A-M).

Fix, measured in tools/profile_conv_fix{,2}.py:

* backward routes the cotangent through ``lax.optimization_barrier`` and
  then uses XLA's OWN vjp lowerings for dx and dw (stride 2:
  15.6 -> 8.4 ms joint, of which ~4.9 ms is the forward itself);
* the hand-rolled 4-shift-einsum weight grad kept from round 2 is
  REMOVED: measured loop-variant it is 5.4 ms vs 1.15 ms for XLA's native
  dw conv — it only ever looked good against the joint-graph pathology;
* barriering the residuals (x, w) as well makes things worse
  (11.9 vs 8.4 ms) — only the cotangent is barriered;
* at the REAL tower shapes (tools/profile_tower_convs.py) the barrier
  helps every stride-2 conv (joint totals: lax 24.8, r2 einsum 20.7,
  barriered 13.3 ms) but HURTS every stride-1 conv (lax 11.0 vs 20.9;
  blk0's 3->64 conv 3.6 -> 12.0) — so the custom path ships for stride 2
  only (conv3x3_same_available), and stride 1 stays on XLA autodiff.

An optional Pallas weight-grad kernel (the in-file ``_dw_pallas`` below,
gated behind EPNET_PALLAS_DW=1) is kept for iteration; it is numerically
tighter (f32 VMEM accumulation) but slower than XLA's dw at most tower
shapes. (tools/conv_dw_pallas_attic.py holds the earlier stacked-shift dw
exploration, reachable only from the profiler tools.)

EPNET_S2_BARRIER=0 disables the custom backward entirely (plain lax
autodiff) for end-to-end A/B of the barrier fix inside the full train
step.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _conv(x: jnp.ndarray, w: jnp.ndarray, stride: int) -> jnp.ndarray:
    return jax.lax.conv_general_dilated(
        x, w, (stride, stride), 'SAME',
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'))


def _conv_fwd(x: jnp.ndarray, w: jnp.ndarray, stride: int) -> jnp.ndarray:
    """Forward dispatch. Round 4 settled the forward question with on-chip
    measurement (tools/profile_fwd_pallas.py, B4 bf16): XLA's strided
    lowering wins at EVERY tower s2 shape — the round-3 Pallas row-tile
    kernel cannot compile within v5e's 16 MB scoped VMEM (its phase-split
    intermediates tile to 79 MB), and the space-to-depth 2x2-conv
    reformulation loses everywhere (blk0 6.2 vs 5.0 ms, blk1 3.2 vs 1.3,
    blk2 0.9 vs 0.3 — the s2d transpose costs more than the strided
    inefficiency it removes). Both live in tools/conv_fwd_attic.py with
    the numbers; the shipped forward is plain lax."""
    return _conv(x, w, stride)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def conv3x3_same(x: jnp.ndarray, w: jnp.ndarray, stride: int) -> jnp.ndarray:
    """x (B, H, W, C); w (3, 3, C, F). SAME padding — identical values to
    ``lax.conv_general_dilated``; the custom part is only the backward
    wiring (barriered cotangent + XLA-native pulls, see module docstring).
    """
    return _conv_fwd(x, w, stride)


def _fwd(x, w, stride):
    return _conv_fwd(x, w, stride), (x, w)


def _dx_phase_s2(dy, w):
    """Input grad of the SAME/s2/even-H,W 3x3 conv WITHOUT zero dilation.

    XLA lowers the s2 dx as an lhs_dilate=2x2 transposed conv (seen in the
    train step's optimized HLO) — 4x the MACs on inserted zeros. With
    y[i] = sum_d x[2i+d] K[d]:

        dx[2u+p, 2v+q] = sum_{a,b in {0,1}} dy[u-a, v-b] K[p+2a, q+2b]

    (taps with p+2a > 2 are zero), i.e. ONE dense 2x2 correlation of dy
    into 4C phase channels + a depth-to-space interleave — 16/9 of the
    forward FLOPs, all dense."""
    Bq, H2, W2, F = dy.shape
    C = w.shape[2]
    z = jnp.zeros_like(w[0, 0].T)                   # (F, C)
    taps = {}
    for ap in (0, 1):                               # ap = 1 - a
        for bp in (0, 1):
            for p in (0, 1):
                for q in (0, 1):
                    d = p + 2 * (1 - ap)
                    e = q + 2 * (1 - bp)
                    taps[(ap, bp, p, q)] = (w[d, e].T if d <= 2 and e <= 2
                                            else z)
    kp = jnp.stack([
        jnp.stack([
            jnp.concatenate([taps[(ap, bp, p, q)]
                             for p in (0, 1) for q in (0, 1)], axis=1)
            for bp in (0, 1)], axis=0)
        for ap in (0, 1)], axis=0)                  # (2, 2, F, 4C)
    out = lax.conv_general_dilated(
        dy, kp, (1, 1), ((1, 0), (1, 0)),
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'))  # (B, H2, W2, 4C)
    out = out.reshape(Bq, H2, W2, 2, 2, C)
    return out.transpose(0, 1, 3, 2, 4, 5).reshape(Bq, 2 * H2, 2 * W2, C)


def _dw_phase_s2(x, dy, wshape):
    """Weight grad of the SAME/s2 conv without rhs dilation: slot (d, e)
    is one (C, B*H2*W2) x (B*H2*W2, F) dot against the matching strided
    phase of x (9 dense dots; XLA's lowering is a giant-window conv with
    rhs_dilate=2x2 over the zero-dilated cotangent)."""
    B, H, W, C = x.shape
    _, H2, W2, F = dy.shape
    dyf = dy.reshape(B * H2 * W2, F)
    slots = []
    for d in range(3):
        for e in range(3):
            # x[2h+d, 2w+e] for h < H2, w < W2: rows d..d+2H2-2 step 2
            xs = lax.slice(x, (0, d, e, 0), (B, min(d + 2 * H2 - 1, H) ,
                                             min(e + 2 * W2 - 1, W), C),
                           (1, 2, 2, 1))
            # bottom/right edge taps (d or e == 2) fall one row/col short —
            # SAME pad_hi=1 means that tap reads zeros at the image edge
            hs, ws = xs.shape[1], xs.shape[2]
            if hs < H2 or ws < W2:
                xs = jnp.pad(xs, ((0, 0), (0, H2 - hs), (0, W2 - ws),
                                  (0, 0)))
            slots.append(lax.dot_general(
                xs.reshape(B * H2 * W2, C), dyf,
                (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32))
    return jnp.stack(slots, axis=0).reshape(3, 3, C, F).astype(wshape)


def _dw_shift_s1(x, dy, wdtype):
    """s1 SAME weight grad as 9 shifted (B*H*W, C) x (B*H*W, F) MXU dots:
    dw[d, e] = sum_{i,j} xpad[i+d, j+e] dy[i, j] with xpad = pad(x, 1).
    Round-5 candidate (VERDICT r4 item 2): extend the proven im2col
    patches-matmul weight-grad treatment (RGB stem) to the C=64..512
    stride-1 tower convs WITHOUT materializing the 9x patches tensor.
    Env-gated EPNET_S1_SHIFT_DW=1; e2e A/B only (isolated wins lie)."""
    B, H, W, C = x.shape
    F = dy.shape[-1]
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    dyf = dy.reshape(B * H * W, F)
    slots = []
    for d in range(3):
        for e in range(3):
            xs = lax.slice(xp, (0, d, e, 0), (B, d + H, e + W, C))
            slots.append(lax.dot_general(
                xs.reshape(B * H * W, C), dyf,
                (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32))
    return jnp.stack(slots, axis=0).reshape(3, 3, C, F).astype(wdtype)


def _bwd(stride, res, dy):
    x, w = res
    B, H, W, C = x.shape
    F = w.shape[-1]

    if stride == 1:
        # s1 custom path exists only for the EPNET_S1_SHIFT_DW experiment
        # (conv3x3_same_available gates it): dx through XLA's own vjp
        # UNbarriered (the barrier hurts every s1 conv — module docstring),
        # dw through the 9-shift dots.
        _, pull_x = jax.vjp(lambda xx: _conv(xx, w, stride), x)
        dx, = pull_x(dy)
        dw = _dw_shift_s1(x, dy, w.dtype)
        return dx, dw

    # The barrier detaches the cotangent from its producer fusion; without
    # it XLA compiles the fwd+bwd cluster ~2x slower (module docstring).
    dyb = lax.optimization_barrier(dy)

    if stride == 2 and _dw_available(H, W, C, F):
        _, pull_x = jax.vjp(lambda xx: _conv(xx, w, stride), x)
        dx, = pull_x(dyb)
        dw = _dw_pallas(x, dyb, F).astype(w.dtype)
        return dx, dw

    if stride == 2:
        import os
        mode = os.environ.get('EPNET_S2_PHASE_BWD', '')
        # The phase decompositions assume even H/W (SAME/s2 with pad_lo=0);
        # odd spatial dims pad lo=1 and the phase algebra silently shifts.
        if H % 2 or W % 2:
            mode = ''
        if 'dx' in mode or mode == '1':
            dx = _dx_phase_s2(dyb, w)
        else:
            _, pull_x = jax.vjp(lambda xx: _conv(xx, w, stride), x)
            dx, = pull_x(dyb)
        if 'dw' in mode or mode == '1':
            dw = _dw_phase_s2(x, dyb, w.dtype)
        else:
            _, pull_w = jax.vjp(lambda ww: _conv(x, ww, stride), w)
            dw, = pull_w(dyb)
        return dx, dw

    _, pull = jax.vjp(lambda xx, ww: _conv(xx, ww, stride), x, w)
    dx, dw = pull(dyb)
    return dx, dw


conv3x3_same.defvjp(_fwd, _bwd)


def conv3x3_stride2(x: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """Back-compat wrapper: the downsampling (stride-2, even H/W) case."""
    return conv3x3_same(x, w, 2)


def conv3x3_s1_im2col(x: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """3x3 SAME stride-1 conv as an explicit patches->matmul ("im2col").

    For tiny C_in — the image tower's 3-channel RGB stem
    (reference BasicBlock's first conv, ``lib/net/pointnet2_msg.py:160``) —
    XLA's conv weight-grad lowering is the single largest item in the
    in-graph train backward (tools/profile_train_cuts.py). As an im2col
    dot the weight grad becomes ``dw = patches^T dy``, a clean
    (9C, B*H*W) x (B*H*W, F) MXU contraction, and dx w.r.t. the raw image
    is dead code (images aren't differentiated) so the 9 pad-adds of the
    concat's VJP never run. Gated to C_in <= 8: the patches tensor is 9x
    the input bytes, trivial at C=3 but prohibitive at tower widths."""
    B, H, W, C = x.shape
    F = w.shape[-1]
    assert w.shape[:3] == (3, 3, C), (x.shape, w.shape)
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    u = jnp.concatenate(
        [xp[:, di:di + H, dj:dj + W, :] for di in range(3) for dj in range(3)],
        axis=-1)
    # NB: no preferred_element_type — under bf16 the MXU still accumulates
    # f32 internally, but forcing an f32 output made XLA materialize a
    # 503 MB f32[4,384,1280,64] intermediate (seen in the optimized HLO)
    y = lax.dot_general(u.reshape(B * H * W, 9 * C), w.reshape(9 * C, F),
                        (((1,), (0,)), ((), ())))
    return y.reshape(B, H, W, F)


def stem_im2col_available(x_shape, kernel: int, stride: int) -> bool:
    """EPNET_STEM_IM2COL=0 disables (A/B knob)."""
    import os
    return (os.environ.get('EPNET_STEM_IM2COL', '1') != '0'
            and kernel == 3 and stride == 1 and x_shape[-1] <= 8)


def conv3x3_same_available(x_shape, kernel: int, stride: int) -> bool:
    """Ship the custom backward for stride 2 only: per-conv profiling at
    the real tower shapes (tools/profile_tower_convs.py) shows the barrier
    helps every s2 conv (24.8 -> 13.3 ms total vs lax autodiff) but hurts
    every s1 conv (11.0 -> 20.9 ms; blk0's 3->64 conv 3.6 -> 12.0!).

    EPNET_S2_BARRIER=0 routes even the s2 convs back to plain lax autodiff
    (end-to-end A/B of the barrier fix inside the full train step).
    EPNET_S1_SHIFT_DW=1 additionally routes the stride-1 tower convs
    (C_in > 8; the stem keeps its im2col path) through the 9-shift-dot
    weight grad (_dw_shift_s1) with unbarriered XLA dx."""
    import os
    if (stride == 1 and kernel == 3 and x_shape[-1] > 8
            and os.environ.get('EPNET_S1_SHIFT_DW', '0') == '1'):
        return True
    if os.environ.get('EPNET_S2_BARRIER', '1') == '0':
        return False
    return (kernel == 3 and stride == 2
            and x_shape[1] % 2 == 0 and x_shape[2] % 2 == 0)


# Back-compat alias (round-2 name).
def conv3x3_stride2_available(x_shape, kernel: int, stride: int) -> bool:
    return stride == 2 and conv3x3_same_available(x_shape, kernel, stride)


# ---------------------------------------------------------------------------
# Optional Pallas stride-2 weight grad (EPNET_PALLAS_DW=1): slot-grid
# streaming kernel with f32 VMEM accumulation. Numerically tighter than
# lax's bf16 weight grad (rel 3e-7 vs 2.6e-3 against an f32 oracle) but
# slower at most tower shapes; kept for iteration.
# ---------------------------------------------------------------------------


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


def _dw_available(H, W, C, F, tm=4):
    """Off by default — see module docstring. Enable with EPNET_PALLAS_DW=1
    to iterate on the Pallas weight-grad path. Requires even H AND W (the
    kernel's space-to-depth phase reshapes assume both)."""
    import os
    return (os.environ.get('EPNET_PALLAS_DW', '0') == '1'
            and H % 2 == 0 and W % 2 == 0 and (H // 2) % tm == 0
            and C * F <= 256 * 256
            and jax.default_backend() == 'tpu')
