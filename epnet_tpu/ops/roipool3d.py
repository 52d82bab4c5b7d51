"""RoI-aware point pooling with static shapes.

Replaces the 3-kernel CUDA pipeline of the reference
(``/root/reference/lib/utils/roipool3d/src/roipool3d_kernel.cu``:
assign_pts_to_box3d :97-120, get_pooled_idx :123-160, gather :163-195):

  1. analytic point-in-(enlarged)-rotated-box mask for all (B, M, N),
  2. the first ``sampled_pt_num`` in-box indices per box (index order),
     duplicated cyclically when a box holds fewer points,
  3. gather of xyz + features into (B, M, S, 3+C), with an empty flag.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax

from .boxes import enlarge_box3d, points_in_boxes3d
from .pointops import _resolve_exact


def roipool3d(
    xyz: jnp.ndarray,
    features: jnp.ndarray,
    boxes3d: jnp.ndarray,
    pool_extra_width: float,
    sampled_pt_num: int = 512,
    exact: bool = None,
):
    """
    :param xyz: (B, N, 3) points in rect coords
    :param features: (B, N, C)
    :param boxes3d: (B, M, 7)
    :return: pooled_xyz (B, M, S, 3) in xyz dtype,
        pooled_feats (B, M, S, C) in features dtype, empty_flag (B, M) int32,
        cnt (B, M) int32 in-box point count (approx path: points actually
        recovered). On the exact path slots are cyclically duplicated; on
        the approx path slots [0, min(cnt, S)) hold the distinct points and
        the rest repeat slot 0 — consumers that weight by multiplicity
        (mask_score) must reweight using ``cnt`` (see proposal_target_layer).

    The exact path reproduces the CUDA first-S-by-index selection
    (roipool3d_kernel.cu:123-160) via a full top_k. On TPU the default is
    ``approx_max_k`` (recall 0.98): ~2% of in-box points in a >0-point box
    can be replaced by cyclic duplicates of found ones — the same
    train/eval-consistent selection-policy approximation as ball_query
    (train and eval share this path, so the learned features co-adapt;
    see tools/verify_tpu_ops.py --e2e). Cuts the exact 16384->512 sort,
    the dominant cost of eval pooling.
    """
    B, N, _ = xyz.shape
    M = boxes3d.shape[1]
    S = sampled_pt_num
    exact = _resolve_exact(exact, op='roipool')

    big = enlarge_box3d(boxes3d.reshape(-1, 7), pool_extra_width).reshape(B, M, 7)
    mask = points_in_boxes3d(xyz, big)  # (B, M, N)

    iota = jnp.arange(N, dtype=jnp.int32)
    k = min(S, N)
    if exact:
        key = jnp.where(mask, iota, N)
        neg_vals, _ = lax.top_k(-key, k)
        first_k = -neg_vals  # ascending first-hit indices, padded with N
        cnt = jnp.sum(mask, axis=-1).astype(jnp.int32)  # (B, M)
    else:
        # f32 keys hold indices < 2^24 exactly; sentinel strictly below all.
        # recall 0.9 (not 0.98): the top-k aggregation dominates at k=512
        # over 16384 keys (6.2 ms vs 1.4 ms/B8x100 on v5e); the ~10% missed
        # in-box points in crowded boxes become pad duplicates, the same
        # selection-policy approximation family as above (train and eval
        # share it; quality pinned by tests/test_overfit.py + the e2e
        # ablation in tools/verify_tpu_ops.py).
        # EPNET_ROIPOOL_RECALL (round-5 quality knob, default 0.9):
        # tightening candidate if the per-op AP attribution implicates the
        # roipool selection (see _ball_knobs / the 3-NN knobs).
        import os
        rc = float(os.environ.get('EPNET_ROIPOOL_RECALL', '0.9'))
        keys = jnp.where(mask, -iota.astype(jnp.float32), -2.0 * N)
        v, first_k = lax.approx_max_k(keys, k, recall_target=rc)
        found = v > -2.0 * N
        first_k = jnp.where(found, first_k, N).astype(jnp.int32)
        # effective count = points actually recovered (recall misses wrap)
        cnt = jnp.sum(found, axis=-1).astype(jnp.int32)
    if k < S:
        first_k = jnp.pad(first_k, ((0, 0), (0, 0), (0, S - k)), constant_values=N)
    empty_flag = (cnt == 0).astype(jnp.int32)

    slot = jnp.arange(S, dtype=jnp.int32)
    if exact:
        # cyclic duplication for boxes with cnt < S
        # (roipool3d_kernel.cu:144-153)
        safe_cnt = jnp.clip(cnt, 1, None)[..., None]
        wrapped_slot = slot % safe_cnt  # (B, M, S)
        need_wrap = slot >= jnp.minimum(cnt, S)[..., None]
        sel_slot = jnp.where(need_wrap, wrapped_slot, slot)
        idx = jnp.take_along_axis(first_k, sel_slot, axis=-1)  # (B, M, S)
    else:
        # approx path: pad short boxes by repeating the FIRST in-box point
        # (the ball_query pad policy) instead of cycling. The distinct-point
        # set per box is identical — slots [0, cnt) hold every found point
        # either way; the RCNN tower consumes the pool set-wise (per-row MLP
        # + sample-max), and the one multiplicity-sensitive consumer
        # (mask_score) reweights with the returned cnt. Cycling costs a
        # (B, M, S) lane-axis take_along_axis, which XLA lowers as a slow
        # per-lane gather (~5.5 ms/B8 — tools/profile_roipool_pieces.py);
        # the pad is a pure select.
        pad = first_k[..., 0:1]
        idx = jnp.where(slot < jnp.minimum(cnt, S)[..., None], first_k, pad)
    idx = jnp.where(empty_flag[..., None] > 0, 0, jnp.clip(idx, 0, N - 1))

    # ONE packed row gather: TPU gathers pay per gathered row AND per byte
    # at these widths, so gather once from a single table, and keep the
    # table 16-bit when features are 16-bit (measured 8.4 -> 3.0 ms at
    # B8 x 100 x 512 x 133ch, tools/profile_roipool_pieces.py). xyz rides
    # along bit-exactly as two uint16 halves per f32 lane.
    flat_idx = idx.reshape(B, M * S)[..., None]
    feat16 = features.dtype in (jnp.bfloat16, jnp.float16)
    if feat16 and xyz.dtype == jnp.float32:
        xyz16 = lax.bitcast_convert_type(xyz, jnp.uint16).reshape(B, N, 6)
        f16 = lax.bitcast_convert_type(features, jnp.uint16)
        table = jnp.concatenate([xyz16, f16], axis=-1)
        pooled = jnp.take_along_axis(table, flat_idx, axis=1).reshape(
            B, M, S, table.shape[-1])
        pooled_xyz = lax.bitcast_convert_type(
            pooled[..., :6].reshape(B, M, S, 3, 2), jnp.float32)
        pooled_feats = lax.bitcast_convert_type(pooled[..., 6:], features.dtype)
    else:
        table = jnp.concatenate([xyz, features.astype(xyz.dtype)], axis=-1)
        pooled = jnp.take_along_axis(table, flat_idx, axis=1).reshape(
            B, M, S, table.shape[-1])
        pooled_xyz = pooled[..., :3]
        pooled_feats = pooled[..., 3:].astype(features.dtype)
    # empty boxes produce all-zero output like the CUDA pipeline
    empty = empty_flag[..., None, None] > 0
    pooled_xyz = jnp.where(empty, 0.0, pooled_xyz)
    pooled_feats = jnp.where(empty, 0, pooled_feats)
    return pooled_xyz, pooled_feats, empty_flag, cnt
