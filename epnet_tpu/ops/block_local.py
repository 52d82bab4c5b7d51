"""Block-local nested multi-scale grouping for Morton-sorted clouds.

The TPU speed path for RPN set-abstraction neighbourhoods. The shipped
approx path (``ball_query_nested`` + ``group_points``) costs two
HBM-heavy pieces at sa0 shapes (B8, N=16384, M=4096, S=32 on v5e):

  * the (B, M, N) distance field (~134M keys) behind ``approx_max_k``
    (~6 ms), and
  * a ~1M-row gather (~7 ns/row regardless of index locality or row
    width — tools/profile_gather_locality.py), ~10 ms.

With the cloud in Morton order (``ops/morton.py``; the loader sorts each
scene) and the centroid indices sorted ascending, a centroid's in-radius
neighbours live in a small contiguous window of the array. Each block of
``block_c`` consecutive centroids then shares ONE window of ``window``
consecutive points: extraction is a handful of contiguous slices, the
ball select is a nearest-first select over the window, and the row
gather collapses to an in-VMEM one-hot matmul on the MXU. xyz rows ride
an f32 HIGHEST-precision one-hot (bit-exact selection, like
``group_points``'s small-table path); bf16 feature rows ride the same
one-hot at DEFAULT precision (0/1 selection of bf16 values through the
f32 accumulator is exact).

Selection policy: nearest-first *within the window* — the same
train/eval-consistent approximation family as the nested approx query
(see ball_query_nested's policy note and the ROADMAP ablation); in-radius
points outside the window (Morton discontinuities, window overflow) are
dropped. The reference semantics being approximated is
ball_query_gpu.cu:9-67 + group_points_gpu.cu:8-86.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax import lax


def block_local_fp_available(n: int, m: int, ublock: int, window: int) -> bool:
    """Static gate for the windowed FP interpolation: the unknown level must
    tile into ublocks and the known level must hold at least one window."""
    return n % ublock == 0 and m >= window and window % 128 == 0


def block_local_three_interp(
    unknown: jnp.ndarray,
    known_xyz: jnp.ndarray,
    known_feats: jnp.ndarray,
    known_idx: jnp.ndarray,
    ublock: int = 512,
    window: int = 256,
) -> jnp.ndarray:
    """Windowed 3-NN inverse-distance interpolation for Morton-sorted levels.

    The TPU speed path for feature propagation (``three_nn`` +
    ``three_interpolate``; reference ``interpolate_gpu.cu:9-160``). The
    dense path materializes a (B, N, M) distance field behind
    ``approx_min_k`` and then row-gathers 3N feature rows (~7-13 ns/row
    regardless of locality); at fp0 shapes (B8, 16384-in-4096, 128ch) the
    pair costs ~12 ms/B8 — the single biggest eval line item.

    With both levels in Morton order (the known level is an
    ascending-sorted FPS subset of the unknown level, see
    ``SAModuleMSG``), each block of ``ublock`` consecutive unknowns finds
    its 3 nearest knowns inside one ``window`` of consecutive knowns
    (located by bisecting ``known_idx``). Inside a block the 3-NN is an
    exact top-3 over the window, and the interpolation collapses to ONE
    (ublock, window) x (window, C) matmul: the weight matrix has the 3
    inverse-distance weights scattered into the neighbour columns — no row
    gather anywhere. Knowns outside the window (Morton discontinuities)
    are dropped: the same train/eval-consistent approximation family as
    ``block_local_group_nested``.

    :param unknown: (B, N, 3) query points, Morton-sorted along N.
    :param known_xyz: (B, M, 3) reference points = unknown's FPS subset,
        Morton-sorted (ascending parent index).
    :param known_feats: (B, M, C) features (f32 or bf16; the weight matmul
        runs in this dtype like the dense path's cast weights).
    :param known_idx: (B, M) int32 ascending positions of the knowns in the
        unknown array.
    :return: (B, N, C) interpolated features.
    """
    B, N, _ = unknown.shape
    M = known_xyz.shape[1]
    NBU = N // ublock
    unknown = lax.stop_gradient(unknown)
    known_xyz = lax.stop_gradient(known_xyz)
    known_idx = lax.stop_gradient(known_idx)
    C = known_feats.shape[-1]
    fdt = known_feats.dtype

    # window start per unknown block: centre the window on the knowns whose
    # parent position falls at the block's midpoint
    mids = (jnp.arange(NBU, dtype=jnp.int32) * ublock + ublock // 2)
    centers = jax.vmap(lambda ki: jnp.searchsorted(ki, mids))(known_idx)
    starts = jnp.clip(centers.astype(jnp.int32) - window // 2, 0, M - window)

    def one(ub, kxb, kfb, sb):
        # ub (N, 3), kxb (M, 3), kfb (M, C), sb (NBU,)
        wx = jax.vmap(lambda s: lax.dynamic_slice(kxb, (s, 0), (window, 3)))(sb)
        wf = jax.vmap(lambda s: lax.dynamic_slice(kfb, (s, 0), (window, C)))(sb)
        d2 = _d2_normalized(ub.reshape(NBU, ublock, 3), wx, jnp.float32(1.0))
        d2 = jnp.clip(d2, 0.0, None)
        # exact top-3 min: 3 masked argmin passes (sort-free, VPU-cheap at
        # window width; mirrors pointops.three_nn's exact path)
        iota = jnp.arange(window, dtype=jnp.int32)
        d = d2
        wmat = jnp.zeros(d2.shape, jnp.float32)
        recips = []
        onehots = []
        for _ in range(3):
            # min == value at argmin (d2 >= 0, masked slots are +inf); a lane
            # reduction instead of a take_along_axis lane-gather (which costs
            # multiple ms at fp0 shapes on TPU)
            v = jnp.min(d, axis=-1)
            i = jnp.argmin(d, axis=-1)
            oh = (iota == i[..., None])
            recips.append(1.0 / (jnp.sqrt(v) + 1e-8))
            onehots.append(oh)
            d = jnp.where(oh, jnp.inf, d)
        tot = recips[0] + recips[1] + recips[2]
        for r, oh in zip(recips, onehots):
            wmat = wmat + jnp.where(oh, (r / tot)[..., None], 0.0)
        out = jnp.einsum('nuw,nwc->nuc', wmat.astype(fdt), wf,
                         preferred_element_type=jnp.float32).astype(fdt)
        return out.reshape(N, C)

    return jax.vmap(one)(unknown, known_xyz, known_feats, starts)


def bucket_ball_query(
    radius: float,
    nsample: int,
    xyz: jnp.ndarray,
    new_xyz: jnp.ndarray,
) -> jnp.ndarray:
    """Dense strided-bucket ball query over a spatially-ordered cloud,
    returning GLOBAL indices.

    For small per-roi tables (N <= ~1024) the windowed slicing of
    ``block_local_window_query`` is slice-latency-bound (~3 ms for 3200
    (256,3) dynamic slices at RCNN shapes) and ``approx_max_k`` at narrow
    widths is aggregation-bound — this computes ONE exact-f32 VPU distance
    field over the whole table and picks the nearest in-radius lane per
    ``lane % nsample`` bucket (sort-free; contiguous in-radius runs up to
    ``nsample`` survive intact — the cloud is spatially ordered). Same
    selection-policy family as ``block_local_group_multi``.

    :param xyz: (T, N, 3), spatially ordered along N; N % nsample == 0.
    :param new_xyz: (T, M, 3) centroids.
    :return: (T, M, nsample) int32 global indices, pad-resolved (empty
        balls take the nearest lane; all-empty takes 0).
    """
    T, N, _ = xyz.shape
    assert N % nsample == 0, (N, nsample)
    xyz = lax.stop_gradient(xyz)
    new_xyz = lax.stop_gradient(new_xyz)
    diff = new_xyz[:, :, None, :] - xyz[:, None, :, :]
    d2 = jnp.sum(diff * diff, axis=-1)                    # (T, M, N)
    keys = jnp.where(d2 < float(radius) ** 2, d2, jnp.inf)
    kr = keys.reshape(T, keys.shape[1], N // nsample, nsample)
    vmin = jnp.min(kr, axis=2)
    cstar = jnp.argmin(kr, axis=2).astype(jnp.int32)
    idx = cstar * nsample + jnp.arange(nsample, dtype=jnp.int32)
    valid = jnp.isfinite(vmin)
    any_hit = jnp.any(valid, axis=-1, keepdims=True)
    pad = jnp.argmin(d2, axis=-1).astype(jnp.int32)       # nearest lane
    idx = jnp.where(valid, idx, pad[..., None])
    return jnp.where(any_hit, idx, 0)


def window_starts(parent_idx: jnp.ndarray, n: int, window: int,
                  block_c: int, align: int = 8) -> jnp.ndarray:
    """Aligned window start per block of ``block_c`` position-sorted
    centroids (span midpoint, clipped and ``align``-aligned)."""
    B, M = parent_idx.shape
    NB = M // block_c
    pb = lax.stop_gradient(parent_idx).reshape(B, NB, block_c)
    mid = (pb[:, :, 0] + pb[:, :, -1]) // 2
    starts = jnp.clip(mid - window // 2, 0, n - window)
    return ((starts // align) * align).astype(jnp.int32)


def to_window_relative(idx: jnp.ndarray, starts: jnp.ndarray,
                       window: int) -> jnp.ndarray:
    """Convert global gather indices to window-relative ones for the
    windowed fused kernel. Out-of-window neighbours (spatial-order
    violations) fall back to any in-window member (min relative index),
    or slot 0 when none exists — the block-local drop policy, applied
    elementwise instead of via per-block slicing.

    :param idx: (T, M, S) int32 global indices; starts: (T, NB), NB | M.
    """
    T, M, S = idx.shape
    NB = starts.shape[1]
    ws = jnp.repeat(starts, M // NB, axis=1)[..., None]   # (T, M, 1)
    rel = idx - ws
    valid = (rel >= 0) & (rel < window)
    relm = jnp.where(valid, rel, 2 * window)
    pad = jnp.min(relm, axis=-1, keepdims=True)
    has = pad < 2 * window
    return jnp.where(valid, rel, jnp.where(has, pad, 0)).astype(jnp.int32)


def block_local_window_query(
    radius: float,
    nsample: int,
    xyz: jnp.ndarray,
    parent_idx: jnp.ndarray,
    new_xyz: jnp.ndarray = None,
    window: int = 256,
    block_c: int = 32,
    align: int = 8,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Single-scale ball query over per-block windows, returning
    WINDOW-RELATIVE indices (for the windowed fused SA kernel,
    ``sa_fused.fused_point_mlp_max_win``).

    Selection is a sort-free strided-bucket pick (nearest in-radius point
    per ``lane % nsample`` bucket — see inline note) within the shared
    window of ``block_c`` consecutive (position-sorted) centroids; instead
    of gathering rows it hands the fused kernel ``(idx_rel, starts)`` so
    the gather happens in VMEM against a ``window``-row slice.

    :param xyz: (T, N, 3) spatially-ordered points (e.g. roipool output of
        a Morton-sorted cloud — first-hit selection preserves scan order).
    :param parent_idx: (T, M) int32 centroid positions, ascending per row.
    :return: (idx_rel (T, M, nsample) int32 in [0, window), starts
        (T, NB) int32 aligned to ``align``, cnt (T, M) int32).
    """
    T, N, _ = xyz.shape
    M = parent_idx.shape[1]
    NB = M // block_c
    parent_idx = lax.stop_gradient(parent_idx)
    xyz = lax.stop_gradient(xyz)
    inv = jnp.float32(1.0 / radius)

    pb = parent_idx.reshape(T, NB, block_c)
    mid = (pb[:, :, 0] + pb[:, :, -1]) // 2
    starts = jnp.clip(mid - window // 2, 0, N - window)
    starts = (starts // align) * align  # sublane-aligned dynamic slices

    if new_xyz is None:
        new_xyz = jnp.take_along_axis(xyz, parent_idx[..., None], axis=1)
    cen = lax.stop_gradient(new_xyz)

    assert window % nsample == 0, (window, nsample)
    n_cand = window // nsample

    def one(xb, cb, sb):
        wx = jax.vmap(lambda s: lax.dynamic_slice(xb, (s, 0), (window, 3)))(sb)
        # exact-f32 broadcast-subtract distances: at these tiny K=3 block
        # matmuls the MXU cross-term path (_d2_normalized, 6-pass HIGHEST)
        # is ~5x slower than the fused VPU reduce
        # (tools/profile_sa_win.py)
        diff = (cb.reshape(NB, block_c, 1, 3) - wx[:, None, :, :]) * inv
        d2n = jnp.sum(diff * diff, axis=-1)  # (NB, block_c, window)
        keys = jnp.where(d2n < 1.0, d2n, jnp.inf)
        # strided-bucket select: slot j keeps the nearest in-radius point
        # among window lanes {l : l % nsample == j}. Sort-free (the top-k
        # AGGREGATION dominates approx_max_k at these narrow widths: 10.3 ms
        # vs 0.2 ms unaggregated — tools/profile_sa_win.py); a contiguous
        # in-radius run of <= nsample lanes lands in distinct buckets, so
        # spatially-ordered neighbourhoods survive intact. Crowded balls get
        # a spatially-stratified subset — the same train/eval-consistent
        # policy family as the nested nearest-first select.
        kr = keys.reshape(NB, block_c, n_cand, nsample)
        vmin = jnp.min(kr, axis=2)                       # (NB, BC, nsample)
        cstar = jnp.argmin(kr, axis=2).astype(jnp.int32)
        slot = jnp.arange(nsample, dtype=jnp.int32)
        idx = cstar * nsample + slot                     # window-relative
        valid = jnp.isfinite(vmin)
        cnt = jnp.sum(valid, axis=-1).astype(jnp.int32)
        # pad: any in-radius member (the globally nearest lane)
        pad = jnp.argmin(keys, axis=-1).astype(jnp.int32)
        idx = jnp.where(valid, idx, pad[..., None])
        idx = jnp.where(cnt[..., None] > 0, idx, 0)
        return idx.reshape(M, nsample), cnt.reshape(M)

    idx_rel, cnt = jax.vmap(one)(xyz, cen, starts)
    return idx_rel, starts.astype(jnp.int32), cnt


def block_local_available(n: int, m: int, window: int, block_c: int) -> bool:
    """Static gate: needs clean tiling and a window smaller than the cloud
    (at or below 1024 points the in-window one-hot path of ``group_points``
    already applies, so block-local only pays above it)."""
    return (n > window and n > 1024 and m % block_c == 0
            and window % 128 == 0)


def block_local_group_multi(
    radii: Sequence[float],
    nsamples: Sequence[int],
    xyz: jnp.ndarray,
    feats: Optional[jnp.ndarray],
    parent_idx: jnp.ndarray,
    new_xyz: jnp.ndarray = None,
    window: int = 1024,
    block_c: int = 128,
) -> List[Tuple[jnp.ndarray, Optional[jnp.ndarray]]]:
    """Per-scale strided-bucket grouping over block-local windows.

    Replaces ``block_local_group_nested``'s nearest-first ``approx_max_k``
    select, whose top-k aggregation dominates (6.3 of the 8.8 ms sa0
    grouping at B8; the bucket select is 0.13 ms — tools/profile_sa0_pieces
    + /tmp micro-profiles, see ROADMAP). Each scale independently keeps the
    nearest in-radius window lane per ``lane % nsample_i`` bucket — exactly
    ``nsample_i`` slots, sort-free, contiguous in-radius runs up to
    ``nsample_i`` survive intact (Morton order makes in-radius lanes near-
    contiguous). Crowded balls get a spatially-stratified subset — the same
    train/eval-consistent selection-policy family as the nested
    nearest-first select (quality ablation: tools/block_local_ablation.py).
    The distance field is an exact-f32 VPU broadcast-subtract (the tiny K=3
    MXU cross-term is ~5x slower at these block shapes).

    Empty balls take the window's globally nearest lane; fully-empty
    windows take lane 0 — matching ``ball_query``'s pad family.

    :return: per-scale ``(gx_i (B, M, s_i, 3), gf_i (B, M, s_i, Cf)|None)``
        grouped rows, pad-resolved.
    """
    B, N, _ = xyz.shape
    M = parent_idx.shape[1]
    NB = M // block_c
    parent_idx = lax.stop_gradient(parent_idx)
    xyz = lax.stop_gradient(xyz)
    Cf = 0 if feats is None else feats.shape[-1]
    for s in nsamples:
        assert window % s == 0, (window, s)

    pb = parent_idx.reshape(B, NB, block_c)
    mid = (pb[:, :, 0] + pb[:, :, -1]) // 2
    starts = jnp.clip(mid - window // 2, 0, N - window)

    if new_xyz is None:
        new_xyz = jnp.take_along_axis(xyz, parent_idx[..., None], axis=1)
    cen = lax.stop_gradient(new_xyz)

    def one(xb, fb, cb, sb):
        wx = jax.vmap(lambda s: lax.dynamic_slice(xb, (s, 0), (window, 3)))(sb)
        diff = cb.reshape(NB, block_c, 1, 3) - wx[:, None, :, :]
        d2 = jnp.sum(diff * diff, axis=-1)           # (NB, BC, W) exact f32
        pad = jnp.argmin(d2, axis=-1).astype(jnp.int32)  # nearest lane
        if Cf:
            wf = jax.vmap(
                lambda s: lax.dynamic_slice(fb, (s, 0), (window, Cf)))(sb)
            fprec = (lax.Precision.HIGHEST if fb.dtype == jnp.float32
                     else lax.Precision.DEFAULT)

        # The bucket winner for slot j can only be a window lane with
        # lane % ns == j, so the winner gather is a CANDIDATE-axis one-hot
        # (window/ns wide) over a strided reshape of the window — ns times
        # smaller than the (BC*ns, W) one-hot it replaces, which at sa0
        # shapes (B8, NB32, 4096x1024 bf16 per scale) was ~2 GB of HBM
        # traffic and the dominant sa0 cost (tools/profile_sa0_pieces.py).
        def strided_gather(oh, tbl, ns, prec):
            # oh (NB, BC, ns, Q) 0/1, tbl (NB, W, C) -> (NB, BC, ns, C)
            tr = tbl.reshape(NB, window // ns, ns, tbl.shape[-1])
            return jnp.einsum('nbsq,nqsc->nbsc', oh.astype(tbl.dtype), tr,
                              preferred_element_type=jnp.float32,
                              precision=prec)

        # pad-row values (nearest window lane per centroid — usually the
        # centroid itself at d2=0), via a FACTORED one-hot gather
        # (W = 128 groups x 128 lanes) instead of a (BC, W) one-hot
        pgrp, plane = pad // 128, pad % 128
        oh_g = jax.nn.one_hot(pgrp, window // 128, dtype=jnp.float32)
        oh_l = jax.nn.one_hot(plane, 128, dtype=jnp.float32)

        def pad_gather(tbl, prec):
            # (NB, BC, W//128) x (NB, W//128, 128, C) -> (NB, BC, C)
            tr = tbl.reshape(NB, window // 128, 128, tbl.shape[-1])
            rows = jnp.einsum('nbg,ngsc->nbsc', oh_g.astype(tbl.dtype), tr,
                              preferred_element_type=jnp.float32,
                              precision=prec)
            return jnp.einsum('nbs,nbsc->nbc', oh_l.astype(rows.dtype), rows,
                              precision=prec)

        padx = pad_gather(wx, lax.Precision.HIGHEST)
        if Cf:
            padf = pad_gather(wf, fprec).astype(fb.dtype)

        outs = []
        for r, ns in zip(radii, nsamples):
            keys = jnp.where(d2 < float(r) * float(r), d2, jnp.inf)
            kr = keys.reshape(NB, block_c, window // ns, ns)
            vmin = jnp.min(kr, axis=2)
            cstar = jnp.argmin(kr, axis=2).astype(jnp.int32)
            valid = jnp.isfinite(vmin)                   # (NB, BC, ns)
            any_hit = jnp.any(valid, axis=-1, keepdims=True)
            oh = (cstar[..., None] ==
                  jnp.arange(window // ns, dtype=jnp.int32)).astype(jnp.float32)
            gx = strided_gather(oh, wx, ns, lax.Precision.HIGHEST)
            gx = jnp.where(valid[..., None], gx, padx[:, :, None, :])
            gx = jnp.where(any_hit[..., None], gx, wx[:, None, 0:1, :])
            if Cf:
                gf = strided_gather(oh, wf, ns, fprec).astype(fb.dtype)
                gf = jnp.where(valid[..., None], gf, padf[:, :, None, :])
                gf = jnp.where(any_hit[..., None], gf,
                               wf[:, None, 0:1, :]).reshape(M, ns, Cf)
            else:
                gf = jnp.zeros((M, ns, 0), xb.dtype)
            outs.append((gx.reshape(M, ns, 3), gf))
        return tuple(x for pair in outs for x in pair)

    fdummy = (feats if feats is not None
              else jnp.zeros((B, N, 0), xyz.dtype))
    flat_out = jax.vmap(one)(xyz, fdummy, cen, starts)
    res = []
    for i in range(len(radii)):
        gx, gf = flat_out[2 * i], flat_out[2 * i + 1]
        res.append((gx, gf if feats is not None else None))
    return res


def _d2_normalized(cc, win_xyz, inv):
    """(NB, C, 3) x (NB, W, 3) -> (NB, C, W) squared distance / r_max^2 via
    the MXU cross-term (see pointops._pairwise_d2 for the HIGHEST-precision
    rationale)."""
    a = cc * inv
    b = win_xyz * inv
    aa = jnp.sum(a * a, axis=-1)[..., :, None]
    bb = jnp.sum(b * b, axis=-1)[..., None, :]
    ab = jnp.einsum('ncd,nwd->ncw', a, b, precision=lax.Precision.HIGHEST)
    return aa + bb - 2.0 * ab


def block_local_group_nested(
    radii: Sequence[float],
    nsamples: Sequence[int],
    xyz: jnp.ndarray,
    feats: Optional[jnp.ndarray],
    parent_idx: jnp.ndarray,
    new_xyz: jnp.ndarray = None,
    window: int = 1024,
    block_c: int = 128,
    approx: bool = True,
) -> Tuple[jnp.ndarray, Optional[jnp.ndarray], List[jnp.ndarray]]:
    """Nested nearest-first grouping over block-local candidate windows.

    :param xyz: (B, N, 3) f32 coordinates, Morton-sorted along N.
    :param feats: optional (B, N, Cf) features in the compute dtype
        (bf16 or f32), same ordering.
    :param parent_idx: (B, M) int32 centroid positions in ``xyz``,
        sorted ascending per batch element (centroids are cloud points).
    :param new_xyz: optional pre-gathered (B, M, 3) centroid coordinates
        (avoids a second gather when the caller already has them).
    :param approx: nearest-first select via ``approx_max_k`` (fast) vs
        exact ``top_k`` over the window.
    :return: ``(gx, gf, cnts)`` — gx (B, M, s_max, 3) xyz rows and gf
        (B, M, s_max, Cf) feature rows (None when feats is None), both
        sorted by ascending centroid distance and pad-resolved exactly
        like ``ball_query_nested`` + ``group_points``; cnts[i] (B, M) =
        leading slots inside radii[i], for ``nested_prefix_select``.
    """
    assert list(radii) == sorted(list(radii))
    assert list(nsamples) == sorted(list(nsamples))
    B, N, _ = xyz.shape
    M = parent_idx.shape[1]
    NB = M // block_c
    r_max = float(radii[-1])
    s_max = int(nsamples[-1])
    thrs = [-(float(r) / r_max) ** 2 for r in radii[:-1]]
    inv = jnp.float32(1.0 / r_max)

    parent_idx = lax.stop_gradient(parent_idx)
    xyz = lax.stop_gradient(xyz)

    # one window per centroid block, centred between its first and last
    # parent (parents are monotone, so this is the span midpoint)
    pb = parent_idx.reshape(B, NB, block_c)
    mid = (pb[:, :, 0] + pb[:, :, -1]) // 2
    starts = jnp.clip(mid - window // 2, 0, N - window)  # (B, NB)

    if new_xyz is None:
        new_xyz = jnp.take_along_axis(xyz, parent_idx[..., None], axis=1)
    cen = lax.stop_gradient(new_xyz)
    Cf = 0 if feats is None else feats.shape[-1]

    def one(xb, fb, cb, sb):
        # xb (N, 3), fb (N, Cf) | (N, 0), cb (M, 3), sb (NB,)
        wx = jax.vmap(lambda s: lax.dynamic_slice(xb, (s, 0), (window, 3)))(sb)
        d2n = _d2_normalized(cb.reshape(NB, block_c, 3), wx, inv)
        mask = d2n < 1.0
        keys = jnp.where(mask, (-d2n).astype(jnp.bfloat16),
                         jnp.asarray(-4.0, jnp.bfloat16))
        if approx:
            v, loc = lax.approx_max_k(keys, s_max, recall_target=0.95)
        else:
            v, loc = lax.top_k(keys, s_max)          # nearest-first, exact
        vf = v.astype(jnp.float32)
        valid = vf > -2.0
        cnt = jnp.sum(valid, axis=-1).astype(jnp.int32)
        # pad-resolve: short balls repeat slot 0 (the nearest hit — the
        # centroid itself, d2=0, whenever its parent is inside the window);
        # fully-empty balls (parent drifted out of the window) take row 0
        loc = jnp.where(valid, loc, loc[..., 0:1])
        loc = jnp.where(cnt[..., None] > 0, loc, 0)
        flat = loc.reshape(NB, block_c * s_max)
        oh = jax.nn.one_hot(flat, window, dtype=jnp.bfloat16)
        gx = jnp.einsum('nkw,nwc->nkc', oh.astype(jnp.float32), wx,
                        preferred_element_type=jnp.float32,
                        precision=lax.Precision.HIGHEST)
        if Cf:
            wf = jax.vmap(
                lambda s: lax.dynamic_slice(fb, (s, 0), (window, Cf)))(sb)
            prec = (lax.Precision.HIGHEST if fb.dtype == jnp.float32
                    else lax.Precision.DEFAULT)
            gf = jnp.einsum('nkw,nwc->nkc', oh.astype(fb.dtype), wf,
                            preferred_element_type=jnp.float32,
                            precision=prec).astype(fb.dtype)
            gf = gf.reshape(M, s_max, Cf)
        else:
            gf = jnp.zeros((M, s_max, 0), xb.dtype)
        cnts = [jnp.sum(vf > t, axis=-1).astype(jnp.int32) for t in thrs]
        return (gx.reshape(M, s_max, 3), gf,
                tuple(c.reshape(M) for c in cnts + [cnt]))

    fdummy = (feats if feats is not None
              else jnp.zeros((B, N, 0), xyz.dtype))
    gx, gf, cnts = jax.vmap(one)(xyz, fdummy, cen, starts)
    return gx, (gf if feats is not None else None), list(cnts)
