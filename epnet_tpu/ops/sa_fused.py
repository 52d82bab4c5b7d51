"""Fused set-abstraction interior: gather + 3-layer ReLU MLP + sample-max.

TPU-native replacement for the reference's grouping + SharedMLP + max_pool2d
sequence in the RCNN tower (``/root/reference/lib/net/rcnn_net.py:189-192``
running ``pointnet2_lib/pointnet2/src/group_points_gpu.cu:8-86`` followed by
three 1x1 convs), for the no-BatchNorm configuration the published recipe
uses (RCNN.USE_BN=false).

Why fusing is the right TPU design
----------------------------------
The unfused pipeline materializes (T, M*S, C) grouped tensors in HBM three
times (grouped rows, two MLP intermediates); at the RCNN shapes
(T=B*100 rois, N=512-row per-roi tables, M=128 centroids, S=64 samples,
C=128) that is ~13 GB of HBM round-trips per batch-8 call — the single
largest line item of the eval profile. All per-roi state (the 512x128
layer-1 table, the one-hot tile, both MLP intermediates) fits comfortably
in VMEM, so one Pallas kernel keeps the whole interior on-chip.

Two algebraic moves make the kernel small:

 * **Layer-1 commutes with the gather.** With no BN, layer 1 is
   ``relu(concat(xyz - center, feats) @ W1 + b1)``. Row selection commutes
   with the matmul, so we precompute ``Y = concat(xyz, feats) @ W1 + b1``
   over the *table* (N rows instead of M*S rows: 16x fewer layer-1 FLOPs)
   and the per-centroid offset ``O = center @ W1[:3]``, and the kernel
   computes ``relu(Y[idx] - O)``.
 * **The gather is an on-the-fly one-hot matmul.** TPU row gathers are
   row-latency bound; a (rows, N) 0/1 matrix against the VMEM-resident
   table turns the gather into MXU work. Built *inside* the kernel the
   one-hot never exists in HBM.

The remaining layers (2, 3) and the max over the sample axis run on the
same VMEM tile, so the only HBM traffic is Y/O/idx in and the (T, M, C3)
result out.

Gradients: a custom VJP recomputes the tile in the backward kernel
(checkpoint-style — nothing is saved but the inputs) and accumulates
dY/dO/dW/db across grid steps. Tie-handling in the sample-max matches
autodiff-of-max in aggregate because tied rows are bit-identical duplicates
(ball_query pads short balls by repeating the first hit), so routing the
gradient to the first argmax row is exact after the scatter-add.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pick_tile_m(M: int, S: int, cap: int = 2048) -> int:
    """Largest divisor of M with TM*S rows <= cap (VMEM budget: the one-hot
    tile is rows x N and the backward holds ~8 rows x C intermediates)."""
    best = 1
    for tm in range(1, M + 1):
        if M % tm == 0 and tm * S <= cap:
            best = tm
    return best


def _onehot_t(idx_row, N):
    """Transposed one-hot (N, R) from a (1, R) index row.

    The index row broadcasts down the N sublanes of a (N, R) iota compare —
    no reshape/relayout of a big tile anywhere (the straightforward
    (TM, S, N) compare + reshape-to-(R, N) costs ~20% of the kernel;
    tools/profile_fused_onehot.py). Contract axis 0 of the result against
    axis 0 of the (N, C) table to realize the gather.
    """
    iota = lax.broadcasted_iota(jnp.int32, (N, idx_row.shape[-1]), 0)
    return iota == idx_row


def _contract0(oht, y):
    return lax.dot_general(oht, y, (((0,), (0,)), ((), ())),
                           preferred_element_type=jnp.float32)


def _fwd_kernel(y_ref, o_ref, idx_ref, w2_ref, b2_ref, w3_ref, b3_ref,
                out_ref, *, S: int, n_splits: int):
    TM = o_ref.shape[1]
    N = y_ref.shape[1]
    R = TM * S
    y = y_ref[0]                                   # (N, C1)
    oht = _onehot_t(idx_ref[0, 0], N)              # (N, R) bool

    if n_splits == 1:
        cdt = y.dtype if y.dtype == jnp.bfloat16 else jnp.float32
        g = _contract0(oht.astype(cdt), y.astype(cdt))
    else:
        # exact f32 row selection in 3 bf16 passes: one-hot is exact in
        # bf16 and y == hi + mid + lo exactly (8+8+8 mantissa bits)
        ohb = oht.astype(jnp.bfloat16)
        hi = y.astype(jnp.bfloat16)
        rem = y - hi.astype(jnp.float32)
        mid = rem.astype(jnp.bfloat16)
        lo = (rem - mid.astype(jnp.float32)).astype(jnp.bfloat16)
        g = (_contract0(ohb, hi) + _contract0(ohb, mid)
             + _contract0(ohb, lo))

    C1 = y.shape[-1]
    o = o_ref[0].astype(jnp.float32)               # (TM, C1)
    ob = jnp.broadcast_to(o[:, None, :], (TM, S, C1)).reshape(R, C1)
    h1 = jnp.maximum(g - ob, 0.0)

    cdt = w2_ref.dtype
    h2 = jnp.maximum(
        jnp.dot(h1.astype(cdt), w2_ref[:], preferred_element_type=jnp.float32)
        + b2_ref[:].astype(jnp.float32), 0.0)
    h3 = jnp.maximum(
        jnp.dot(h2.astype(cdt), w3_ref[:], preferred_element_type=jnp.float32)
        + b3_ref[:].astype(jnp.float32), 0.0)

    C3 = w3_ref.shape[-1]
    red = jnp.max(h3.reshape(TM, S, C3), axis=1)   # (TM, C3)
    out_ref[0] = red.astype(out_ref.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9))
def fused_point_mlp_max(y, o, idx, w2, b2, w3, b3,
                        tile_m: int = 0, interpret: bool = None,
                        out_dtype=None):
    """``max_s relu(relu(relu(y[idx] - o) @ w2 + b2) @ w3 + b3)``.

    :param y: (T, N, C1) layer-1 table (``concat(xyz, feats) @ W1 + b1``)
    :param o: (T, M, C1) per-centroid layer-1 offset (``center @ W1[:3]``)
    :param idx: (T, M, S) int32 gather indices into the N axis of ``y``
    :param w2/b2/w3/b3: layer 2/3 weights; compute runs in ``w2.dtype``
    :return: (T, M, C3)
    """
    return _fused_fwd_impl(y, o, idx, w2, b2, w3, b3, tile_m, interpret,
                           out_dtype)


def _fused_fwd_impl(y, o, idx, w2, b2, w3, b3, tile_m, interpret, out_dtype):
    if interpret is None:  # interpreter off-TPU so tests run anywhere
        interpret = jax.default_backend() != 'tpu'
    T, N, C1 = y.shape
    _, M, S = idx.shape
    C2 = w2.shape[-1]
    C3 = w3.shape[-1]
    TM = tile_m or _pick_tile_m(M, S, cap=4096)
    assert M % TM == 0, (M, TM)
    n_splits = 1 if y.dtype == jnp.bfloat16 else 3
    out_dtype = out_dtype or y.dtype

    grid = (T, M // TM)
    kernel = functools.partial(_fwd_kernel, S=S, n_splits=n_splits)
    # idx rides as one (1, R) lane row per tile (4D so the trailing block
    # dims match the array dims — see _onehot_t)
    idx4 = idx.reshape(T, M // TM, 1, TM * S)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, N, C1), lambda t, j: (t, 0, 0)),
            pl.BlockSpec((1, TM, C1), lambda t, j: (t, j, 0)),
            pl.BlockSpec((1, 1, 1, TM * S), lambda t, j: (t, j, 0, 0)),
            pl.BlockSpec((C1, C2), lambda t, j: (0, 0)),
            pl.BlockSpec((1, C2), lambda t, j: (0, 0)),
            pl.BlockSpec((C2, C3), lambda t, j: (0, 0)),
            pl.BlockSpec((1, C3), lambda t, j: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, TM, C3), lambda t, j: (t, j, 0)),
        out_shape=jax.ShapeDtypeStruct((T, M, C3), out_dtype),
        interpret=interpret,
    )(y, o, idx4, w2, b2.reshape(1, C2), w3, b3.reshape(1, C3))


# ---------------------------------------------------------------------------
# Backward: recompute the tile, push gradients back through the MLP and the
# one-hot gather (transposed one-hot matmul = exact scatter-add on the MXU).
# ---------------------------------------------------------------------------

def _bwd_kernel(y_ref, o_ref, idx_ref, w2_ref, b2_ref, w3_ref, b3_ref, g_ref,
                dy_ref, do_ref, dw2_ref, db2_ref, dw3_ref, db3_ref,
                *, S: int, n_splits: int):
    TM = o_ref.shape[1]
    N = y_ref.shape[1]
    R = TM * S
    C1 = y_ref.shape[-1]
    C3 = w3_ref.shape[-1]
    j = pl.program_id(1)
    t = pl.program_id(0)

    # --- recompute forward tile (identical to _fwd_kernel) ---------------
    y = y_ref[0]
    oht = _onehot_t(idx_ref[0, 0], N)
    cdt = w2_ref.dtype
    if n_splits == 1:
        gdt = y.dtype if y.dtype == jnp.bfloat16 else jnp.float32
        g1 = _contract0(oht.astype(gdt), y.astype(gdt))
    else:
        ohb = oht.astype(jnp.bfloat16)
        hi = y.astype(jnp.bfloat16)
        rem = y - hi.astype(jnp.float32)
        mid = rem.astype(jnp.bfloat16)
        lo = (rem - mid.astype(jnp.float32)).astype(jnp.bfloat16)
        g1 = (_contract0(ohb, hi) + _contract0(ohb, mid)
              + _contract0(ohb, lo))
    o = o_ref[0].astype(jnp.float32)
    ob = jnp.broadcast_to(o[:, None, :], (TM, S, C1)).reshape(R, C1)
    h1 = jnp.maximum(g1 - ob, 0.0)
    p2 = (jnp.dot(h1.astype(cdt), w2_ref[:], preferred_element_type=jnp.float32)
          + b2_ref[:].astype(jnp.float32))
    h2 = jnp.maximum(p2, 0.0)
    p3 = (jnp.dot(h2.astype(cdt), w3_ref[:], preferred_element_type=jnp.float32)
          + b3_ref[:].astype(jnp.float32))
    h3 = jnp.maximum(p3, 0.0)
    h3r = h3.reshape(TM, S, C3)
    mx = jnp.max(h3r, axis=1, keepdims=True)       # (TM, 1, C3)

    # --- max backward: split among ties (duplicate rows -> exact) ---------
    gout = g_ref[0].astype(jnp.float32)            # (TM, C3)
    ties = (h3r == mx)
    cnt = jnp.sum(ties.astype(jnp.float32), axis=1, keepdims=True)
    dh3 = (ties.astype(jnp.float32) * (gout[:, None, :] / cnt)).reshape(R, C3)

    dp3 = jnp.where(p3 > 0.0, dh3, 0.0)
    dp3c = dp3.astype(cdt)
    dw3 = jnp.dot(h2.astype(cdt).T, dp3c, preferred_element_type=jnp.float32)
    db3 = jnp.sum(dp3, axis=0, keepdims=True)
    dh2 = jnp.dot(dp3c, w3_ref[:].T, preferred_element_type=jnp.float32)

    dp2 = jnp.where(p2 > 0.0, dh2, 0.0)
    dp2c = dp2.astype(cdt)
    dw2 = jnp.dot(h1.astype(cdt).T, dp2c, preferred_element_type=jnp.float32)
    db2 = jnp.sum(dp2, axis=0, keepdims=True)
    dh1 = jnp.dot(dp2c, w2_ref[:].T, preferred_element_type=jnp.float32)

    dp1 = jnp.where(g1 - ob > 0.0, dh1, 0.0)       # (R, C1) f32
    # gather backward = transposed one-hot matmul (exact scatter-add): the
    # bf16 cast of dp1 mirrors the unfused mixed-precision path's grads;
    # oht is already (N, R) so this is a plain dot
    gdt = jnp.bfloat16 if n_splits == 1 and y.dtype == jnp.bfloat16 else jnp.float32
    dy_tile = jnp.dot(oht.astype(gdt), dp1.astype(gdt),
                      preferred_element_type=jnp.float32)  # (N, C1)
    do_tile = -jnp.sum(dp1.reshape(TM, S, C1), axis=1)     # (TM, C1)

    # --- accumulate across grid steps -------------------------------------
    @pl.when(j == 0)
    def _():
        dy_ref[0] = jnp.zeros_like(dy_ref[0])
    dy_ref[0] += dy_tile.astype(dy_ref.dtype)
    do_ref[0] = do_tile.astype(do_ref.dtype)

    first = jnp.logical_and(t == 0, j == 0)

    @pl.when(first)
    def _():
        dw2_ref[:] = jnp.zeros_like(dw2_ref)
        db2_ref[:] = jnp.zeros_like(db2_ref)
        dw3_ref[:] = jnp.zeros_like(dw3_ref)
        db3_ref[:] = jnp.zeros_like(db3_ref)
    dw2_ref[:] += dw2.astype(dw2_ref.dtype)
    db2_ref[:] += db2.astype(db2_ref.dtype)
    dw3_ref[:] += dw3.astype(dw3_ref.dtype)
    db3_ref[:] += db3.astype(db3_ref.dtype)


def _fused_fwd_rule(y, o, idx, w2, b2, w3, b3, tile_m, interpret, out_dtype):
    out = _fused_fwd_impl(y, o, idx, w2, b2, w3, b3, tile_m, interpret,
                          out_dtype)
    return out, (y, o, idx, w2, b2, w3, b3)


def _fused_bwd_rule(tile_m, interpret, out_dtype, res, gout):
    if interpret is None:
        interpret = jax.default_backend() != 'tpu'
    y, o, idx, w2, b2, w3, b3 = res
    T, N, C1 = y.shape
    _, M, S = idx.shape
    C2 = w2.shape[-1]
    C3 = w3.shape[-1]
    TM = tile_m or _pick_tile_m(M, S, cap=1024)
    n_splits = 1 if y.dtype == jnp.bfloat16 else 3

    grid = (T, M // TM)
    kernel = functools.partial(_bwd_kernel, S=S, n_splits=n_splits)
    idx4 = idx.reshape(T, M // TM, 1, TM * S)
    dy, do, dw2, db2, dw3, db3 = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, N, C1), lambda t, j: (t, 0, 0)),
            pl.BlockSpec((1, TM, C1), lambda t, j: (t, j, 0)),
            pl.BlockSpec((1, 1, 1, TM * S), lambda t, j: (t, j, 0, 0)),
            pl.BlockSpec((C1, C2), lambda t, j: (0, 0)),
            pl.BlockSpec((1, C2), lambda t, j: (0, 0)),
            pl.BlockSpec((C2, C3), lambda t, j: (0, 0)),
            pl.BlockSpec((1, C3), lambda t, j: (0, 0)),
            pl.BlockSpec((1, TM, C3), lambda t, j: (t, j, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, N, C1), lambda t, j: (t, 0, 0)),
            pl.BlockSpec((1, TM, C1), lambda t, j: (t, j, 0)),
            pl.BlockSpec((C1, C2), lambda t, j: (0, 0)),
            pl.BlockSpec((1, C2), lambda t, j: (0, 0)),
            pl.BlockSpec((C2, C3), lambda t, j: (0, 0)),
            pl.BlockSpec((1, C3), lambda t, j: (0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T, N, C1), jnp.float32),
            jax.ShapeDtypeStruct((T, M, C1), jnp.float32),
            jax.ShapeDtypeStruct((C1, C2), jnp.float32),
            jax.ShapeDtypeStruct((1, C2), jnp.float32),
            jax.ShapeDtypeStruct((C2, C3), jnp.float32),
            jax.ShapeDtypeStruct((1, C3), jnp.float32),
        ],
        interpret=interpret,
    )(y, o, idx4, w2, b2.reshape(1, C2), w3, b3.reshape(1, C3), gout)

    return (dy.astype(y.dtype), do.astype(o.dtype), None,
            dw2.astype(w2.dtype), db2.reshape(C2).astype(b2.dtype),
            dw3.astype(w3.dtype), db3.reshape(C3).astype(b3.dtype))


fused_point_mlp_max.defvjp(_fused_fwd_rule, _fused_bwd_rule)


# ---------------------------------------------------------------------------
# Windowed variant: the gather table slice is a per-tile window of the
# (N, C1) table located by a scalar start (block-local grouping over
# spatially-ordered per-roi clouds; indices come window-relative from
# block_local.block_local_window_query). One-hot width drops N -> W, which
# divides both the VPU one-hot build and the MXU gather matmul by N/W.
# ---------------------------------------------------------------------------


def _fwd_kernel_win(ws_ref, y_ref, o_ref, idx_ref, w2_ref, b2_ref, w3_ref,
                    b3_ref, out_ref, *, S: int, W: int, n_splits: int):
    TM = o_ref.shape[1]
    R = TM * S
    ws = pl.multiple_of(ws_ref[pl.program_id(0), pl.program_id(1)], 8)
    y = y_ref[0, pl.ds(ws, W), :]                  # (W, C1)
    oht = _onehot_t(idx_ref[0, 0], W)              # (W, R) bool

    if n_splits == 1:
        cdt = y.dtype if y.dtype == jnp.bfloat16 else jnp.float32
        g = _contract0(oht.astype(cdt), y.astype(cdt))
    else:
        ohb = oht.astype(jnp.bfloat16)
        hi = y.astype(jnp.bfloat16)
        rem = y - hi.astype(jnp.float32)
        mid = rem.astype(jnp.bfloat16)
        lo = (rem - mid.astype(jnp.float32)).astype(jnp.bfloat16)
        g = (_contract0(ohb, hi) + _contract0(ohb, mid)
             + _contract0(ohb, lo))

    C1 = y.shape[-1]
    o = o_ref[0].astype(jnp.float32)
    ob = jnp.broadcast_to(o[:, None, :], (TM, S, C1)).reshape(R, C1)
    h1 = jnp.maximum(g - ob, 0.0)

    cdt = w2_ref.dtype
    h2 = jnp.maximum(
        jnp.dot(h1.astype(cdt), w2_ref[:], preferred_element_type=jnp.float32)
        + b2_ref[:].astype(jnp.float32), 0.0)
    h3 = jnp.maximum(
        jnp.dot(h2.astype(cdt), w3_ref[:], preferred_element_type=jnp.float32)
        + b3_ref[:].astype(jnp.float32), 0.0)

    C3 = w3_ref.shape[-1]
    red = jnp.max(h3.reshape(TM, S, C3), axis=1)
    out_ref[0] = red.astype(out_ref.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(8, 9, 10))
def fused_point_mlp_max_win(y, o, idx_rel, starts, w2, b2, w3, b3,
                            window: int, interpret: bool = None,
                            out_dtype=None):
    """Windowed ``fused_point_mlp_max``: rows are gathered from the
    ``window`` slice of ``y`` starting at ``starts[t, j]`` for centroid
    block j (tile size M // starts.shape[1]).

    :param idx_rel: (T, M, S) int32 WINDOW-RELATIVE indices in [0, window)
    :param starts: (T, NB) int32 window starts (8-aligned), NB divides M
    """
    return _fused_win_impl(y, o, idx_rel, starts, w2, b2, w3, b3, window,
                           interpret, out_dtype)


def _fused_win_impl(y, o, idx, starts, w2, b2, w3, b3, window, interpret,
                    out_dtype):
    if interpret is None:
        interpret = jax.default_backend() != 'tpu'
    T, N, C1 = y.shape
    _, M, S = idx.shape
    NB = starts.shape[1]
    TM = M // NB
    C2 = w2.shape[-1]
    C3 = w3.shape[-1]
    n_splits = 1 if y.dtype == jnp.bfloat16 else 3
    out_dtype = out_dtype or y.dtype

    grid = (T, NB)
    kernel = functools.partial(_fwd_kernel_win, S=S, W=window,
                               n_splits=n_splits)
    idx4 = idx.reshape(T, NB, 1, TM * S)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((T, NB), lambda t, j: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, N, C1), lambda t, j: (t, 0, 0)),
            pl.BlockSpec((1, TM, C1), lambda t, j: (t, j, 0)),
            pl.BlockSpec((1, 1, 1, TM * S), lambda t, j: (t, j, 0, 0)),
            pl.BlockSpec((C1, C2), lambda t, j: (0, 0)),
            pl.BlockSpec((1, C2), lambda t, j: (0, 0)),
            pl.BlockSpec((C2, C3), lambda t, j: (0, 0)),
            pl.BlockSpec((1, C3), lambda t, j: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, TM, C3), lambda t, j: (t, j, 0)),
        out_shape=jax.ShapeDtypeStruct((T, M, C3), out_dtype),
        interpret=interpret,
    )(starts, y, o, idx4, w2, b2.reshape(1, C2), w3, b3.reshape(1, C3))


def _bwd_kernel_win(ws_ref, y_ref, o_ref, idx_ref, w2_ref, b2_ref, w3_ref,
                    b3_ref, g_ref, dy_ref, do_ref, dw2_ref, db2_ref, dw3_ref,
                    db3_ref, *, S: int, W: int, n_splits: int):
    TM = o_ref.shape[1]
    R = TM * S
    C1 = y_ref.shape[-1]
    C3 = w3_ref.shape[-1]
    j = pl.program_id(1)
    t = pl.program_id(0)
    ws = pl.multiple_of(ws_ref[t, j], 8)

    y = y_ref[0, pl.ds(ws, W), :]
    oht = _onehot_t(idx_ref[0, 0], W)
    cdt = w2_ref.dtype
    if n_splits == 1:
        gdt = y.dtype if y.dtype == jnp.bfloat16 else jnp.float32
        g1 = _contract0(oht.astype(gdt), y.astype(gdt))
    else:
        ohb = oht.astype(jnp.bfloat16)
        hi = y.astype(jnp.bfloat16)
        rem = y - hi.astype(jnp.float32)
        mid = rem.astype(jnp.bfloat16)
        lo = (rem - mid.astype(jnp.float32)).astype(jnp.bfloat16)
        g1 = (_contract0(ohb, hi) + _contract0(ohb, mid)
              + _contract0(ohb, lo))
    o = o_ref[0].astype(jnp.float32)
    ob = jnp.broadcast_to(o[:, None, :], (TM, S, C1)).reshape(R, C1)
    h1 = jnp.maximum(g1 - ob, 0.0)
    p2 = (jnp.dot(h1.astype(cdt), w2_ref[:], preferred_element_type=jnp.float32)
          + b2_ref[:].astype(jnp.float32))
    h2 = jnp.maximum(p2, 0.0)
    p3 = (jnp.dot(h2.astype(cdt), w3_ref[:], preferred_element_type=jnp.float32)
          + b3_ref[:].astype(jnp.float32))
    h3 = jnp.maximum(p3, 0.0)
    h3r = h3.reshape(TM, S, C3)
    mx = jnp.max(h3r, axis=1, keepdims=True)

    gout = g_ref[0].astype(jnp.float32)
    ties = (h3r == mx)
    cnt = jnp.sum(ties.astype(jnp.float32), axis=1, keepdims=True)
    dh3 = (ties.astype(jnp.float32) * (gout[:, None, :] / cnt)).reshape(R, C3)

    dp3 = jnp.where(p3 > 0.0, dh3, 0.0)
    dp3c = dp3.astype(cdt)
    dw3 = jnp.dot(h2.astype(cdt).T, dp3c, preferred_element_type=jnp.float32)
    db3 = jnp.sum(dp3, axis=0, keepdims=True)
    dh2 = jnp.dot(dp3c, w3_ref[:].T, preferred_element_type=jnp.float32)

    dp2 = jnp.where(p2 > 0.0, dh2, 0.0)
    dp2c = dp2.astype(cdt)
    dw2 = jnp.dot(h1.astype(cdt).T, dp2c, preferred_element_type=jnp.float32)
    db2 = jnp.sum(dp2, axis=0, keepdims=True)
    dh1 = jnp.dot(dp2c, w2_ref[:].T, preferred_element_type=jnp.float32)

    dp1 = jnp.where(g1 - ob > 0.0, dh1, 0.0)
    gdt = jnp.bfloat16 if n_splits == 1 and y.dtype == jnp.bfloat16 else jnp.float32
    dy_tile = jnp.dot(oht.astype(gdt), dp1.astype(gdt),
                      preferred_element_type=jnp.float32)  # (W, C1)
    do_tile = -jnp.sum(dp1.reshape(TM, S, C1), axis=1)

    @pl.when(j == 0)
    def _():
        dy_ref[0] = jnp.zeros_like(dy_ref[0])
    cur = dy_ref[0, pl.ds(ws, W), :]
    dy_ref[0, pl.ds(ws, W), :] = cur + dy_tile.astype(dy_ref.dtype)
    do_ref[0] = do_tile.astype(do_ref.dtype)

    first = jnp.logical_and(t == 0, j == 0)

    @pl.when(first)
    def _():
        dw2_ref[:] = jnp.zeros_like(dw2_ref)
        db2_ref[:] = jnp.zeros_like(db2_ref)
        dw3_ref[:] = jnp.zeros_like(dw3_ref)
        db3_ref[:] = jnp.zeros_like(db3_ref)
    dw2_ref[:] += dw2.astype(dw2_ref.dtype)
    db2_ref[:] += db2.astype(db2_ref.dtype)
    dw3_ref[:] += dw3.astype(dw3_ref.dtype)
    db3_ref[:] += db3.astype(db3_ref.dtype)


def _fused_win_fwd_rule(y, o, idx, starts, w2, b2, w3, b3, window, interpret,
                        out_dtype):
    out = _fused_win_impl(y, o, idx, starts, w2, b2, w3, b3, window,
                          interpret, out_dtype)
    return out, (y, o, idx, starts, w2, b2, w3, b3)


def _fused_win_bwd_rule(window, interpret, out_dtype, res, gout):
    if interpret is None:
        interpret = jax.default_backend() != 'tpu'
    y, o, idx, starts, w2, b2, w3, b3 = res
    T, N, C1 = y.shape
    _, M, S = idx.shape
    NB = starts.shape[1]
    TM = M // NB
    C2 = w2.shape[-1]
    C3 = w3.shape[-1]
    n_splits = 1 if y.dtype == jnp.bfloat16 else 3

    grid = (T, NB)
    kernel = functools.partial(_bwd_kernel_win, S=S, W=window,
                               n_splits=n_splits)
    idx4 = idx.reshape(T, NB, 1, TM * S)
    dy, do, dw2, db2, dw3, db3 = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((T, NB), lambda t, j: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, N, C1), lambda t, j: (t, 0, 0)),
            pl.BlockSpec((1, TM, C1), lambda t, j: (t, j, 0)),
            pl.BlockSpec((1, 1, 1, TM * S), lambda t, j: (t, j, 0, 0)),
            pl.BlockSpec((C1, C2), lambda t, j: (0, 0)),
            pl.BlockSpec((1, C2), lambda t, j: (0, 0)),
            pl.BlockSpec((C2, C3), lambda t, j: (0, 0)),
            pl.BlockSpec((1, C3), lambda t, j: (0, 0)),
            pl.BlockSpec((1, TM, C3), lambda t, j: (t, j, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, N, C1), lambda t, j: (t, 0, 0)),
            pl.BlockSpec((1, TM, C1), lambda t, j: (t, j, 0)),
            pl.BlockSpec((C1, C2), lambda t, j: (0, 0)),
            pl.BlockSpec((1, C2), lambda t, j: (0, 0)),
            pl.BlockSpec((C2, C3), lambda t, j: (0, 0)),
            pl.BlockSpec((1, C3), lambda t, j: (0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T, N, C1), jnp.float32),
            jax.ShapeDtypeStruct((T, M, C1), jnp.float32),
            jax.ShapeDtypeStruct((C1, C2), jnp.float32),
            jax.ShapeDtypeStruct((1, C2), jnp.float32),
            jax.ShapeDtypeStruct((C2, C3), jnp.float32),
            jax.ShapeDtypeStruct((1, C3), jnp.float32),
        ],
        interpret=interpret,
    )(starts, y, o, idx4, w2, b2.reshape(1, C2), w3, b3.reshape(1, C3), gout)

    return (dy.astype(y.dtype), do.astype(o.dtype), None, None,
            dw2.astype(w2.dtype), db2.reshape(C2).astype(b2.dtype),
            dw3.astype(w3.dtype), db3.reshape(C3).astype(b3.dtype))


fused_point_mlp_max_win.defvjp(_fused_win_fwd_rule, _fused_win_bwd_rule)


def fused_sa_win_available(n: int, m: int, s: int, c1: int, c2: int, c3: int,
                           use_bn: bool, window: int, block_c: int) -> bool:
    """Gate for the windowed fused path: fused-kernel constraints plus a
    window strictly smaller than the table and clean block tiling."""
    return (fused_sa_available(n, m, s, c1, c2, c3, use_bn)
            and window < n and window % 8 == 0
            and m % block_c == 0 and (block_c * s) % 8 == 0)


def fused_sa_available(n: int, m: int, s: int, c1: int, c2: int, c3: int,
                       use_bn: bool) -> bool:
    """The fused kernel covers the no-BN, lane-aligned SA interiors the RCNN
    tower uses (rcnn_net.py:28-42 config: USE_BN false, channels 128/256)."""
    if use_bn:
        return False
    if jax.default_backend() != 'tpu':
        return False
    lanes_ok = all(c % 128 == 0 for c in (c1, c2, c3)) and n % 128 == 0
    vmem_ok = n * c1 * 4 <= 2 * 1024 * 1024  # per-roi table stays in VMEM
    return lanes_ok and vmem_ok and (m * s) % 8 == 0
