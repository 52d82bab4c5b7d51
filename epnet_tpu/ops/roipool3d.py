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


def roipool3d(
    xyz: jnp.ndarray,
    features: jnp.ndarray,
    boxes3d: jnp.ndarray,
    pool_extra_width: float,
    sampled_pt_num: int = 512,
):
    """
    :param xyz: (B, N, 3) points in rect coords
    :param features: (B, N, C)
    :param boxes3d: (B, M, 7)
    :return: pooled (B, M, S, 3+C), empty_flag (B, M) int32
    """
    B, N, _ = xyz.shape
    M = boxes3d.shape[1]
    S = sampled_pt_num

    big = enlarge_box3d(boxes3d.reshape(-1, 7), pool_extra_width).reshape(B, M, 7)
    mask = points_in_boxes3d(xyz, big)  # (B, M, N)

    iota = jnp.arange(N, dtype=jnp.int32)
    key = jnp.where(mask, iota, N)
    k = min(S, N)
    neg_vals, _ = lax.top_k(-key, k)
    first_k = -neg_vals  # ascending first-hit indices, padded with N
    if k < S:
        first_k = jnp.pad(first_k, ((0, 0), (0, 0), (0, S - k)), constant_values=N)
    cnt = jnp.sum(mask, axis=-1).astype(jnp.int32)  # (B, M)
    empty_flag = (cnt == 0).astype(jnp.int32)

    # cyclic duplication for boxes with cnt < S (roipool3d_kernel.cu:144-153)
    slot = jnp.arange(S, dtype=jnp.int32)
    safe_cnt = jnp.clip(cnt, 1, None)[..., None]
    wrapped_slot = slot % safe_cnt  # (B, M, S)
    need_wrap = slot >= jnp.minimum(cnt, S)[..., None]
    sel_slot = jnp.where(need_wrap, wrapped_slot, slot)
    idx = jnp.take_along_axis(first_k, sel_slot, axis=-1)  # (B, M, S)
    idx = jnp.where(empty_flag[..., None] > 0, 0, jnp.clip(idx, 0, N - 1))

    # gather xyz and features separately so a bf16 feature table keeps its
    # dtype through the (HBM-bound) gather; concat upcasts afterwards
    flat_idx = idx.reshape(B, M * S)[..., None]
    g_xyz = jnp.take_along_axis(xyz, flat_idx, axis=1).reshape(B, M, S, 3)
    g_feat = jnp.take_along_axis(features, flat_idx, axis=1).reshape(
        B, M, S, features.shape[-1])
    pooled = jnp.concatenate([g_xyz, g_feat.astype(g_xyz.dtype)], axis=-1)
    # empty boxes produce all-zero output like the CUDA pipeline
    pooled = jnp.where(empty_flag[..., None, None] > 0, 0.0, pooled)
    return pooled, empty_flag
