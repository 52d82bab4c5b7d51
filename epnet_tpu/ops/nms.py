"""Greedy BEV NMS with fixed-size padded outputs.

The reference computes an N x N/64 suppression bitmask on GPU and then runs a
serial greedy scan on the CPU (``/root/reference/lib/utils/iou3d/src/
iou3d_kernel.cu:250-348`` + ``iou3d.cpp:105-116``), returning a
variable-length keep list. Here the whole thing stays on device with static
shapes and two exactness-preserving optimizations:

  * **streaming overlaps**: greedy suppression of box j depends only on boxes
    before j, so the scan walks score-sorted candidates in K-sized blocks and
    computes each block's overlap columns on the fly — the N x N IoU matrix
    is never materialized;
  * **early exit**: the caller only consumes the first ``max_keep`` kept
    boxes, and the greedy prefix property makes the result identical once
    that many are kept, so the block loop is a ``lax.while_loop`` that stops
    as soon as the quota is filled (typically after a handful of blocks).
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
from jax import lax

from .boxes import boxes3d_to_bev  # noqa: F401  (re-export convenience)
from .rotated_iou import boxes_iou_bev, iou_axis_aligned

_BLOCK = 64


def greedy_suppress(over: jnp.ndarray) -> jnp.ndarray:
    """Reference-style greedy scan over a precomputed score-ordered (N, N)
    'overlap above threshold' bool matrix -> (N,) keep flags. Used by tests
    as the oracle; the production path is the streaming scan in nms_bev."""
    N = over.shape[0]
    pad = (-N) % _BLOCK
    if pad:
        over = jnp.pad(over, ((0, pad), (0, pad)))
    Np = N + pad
    iota_n = jnp.arange(Np)
    iota_k = jnp.arange(_BLOCK)

    def body(b, kept):
        start = b * _BLOCK
        cols = lax.dynamic_slice(over, (0, start), (Np, _BLOCK))
        earlier = (iota_n < start)[:, None]
        incoming = jnp.any(cols & kept[:, None] & earlier, axis=0)
        blk = lax.dynamic_slice(over, (start, start), (_BLOCK, _BLOCK))
        s = incoming
        for i in range(_BLOCK):
            s = s | ((~s[i]) & blk[i] & (iota_k > i))
        return lax.dynamic_update_slice(kept, ~s, (start,))

    kept = lax.fori_loop(0, Np // _BLOCK, body, jnp.zeros((Np,), dtype=bool))
    return kept[:N]


def nms_bev(
    boxes_bev: jnp.ndarray,
    scores: jnp.ndarray,
    thresh: float,
    max_keep: int,
    rotated: bool = False,
    num_valid=None,
):
    """NMS over (N, 5) BEV boxes.

    Boxes are sorted by score internally (descending, like
    ``iou3d_utils.nms_gpu`` :56-70). Returns ``(idx, count)``: (max_keep,)
    int32 indices into the *input* order, valid for the first ``count``
    entries and padded with 0. ``num_valid`` (optional scalar) restricts the
    scan to the highest-scoring ``num_valid`` inputs — used by callers that
    pad candidate sets with -inf-score dummies.
    """
    N = boxes_bev.shape[0]
    order = jnp.argsort(-scores)
    sb = boxes_bev[order]
    if num_valid is None:
        num_valid = N
    num_valid = jnp.asarray(num_valid, jnp.int32)

    pad = (-N) % _BLOCK
    Np = N + pad
    if pad:
        # park padding far away with zero extent: overlaps nothing
        filler = jnp.zeros((pad, 5), sb.dtype).at[:, 0:2].set(1e8)
        sb = jnp.concatenate([sb, filler], axis=0)
    iota_n = jnp.arange(Np)
    iota_k = jnp.arange(_BLOCK)

    overlap_fn = boxes_iou_bev if rotated else iou_axis_aligned

    def cond(state):
        kept, kept_cnt, b = state
        return (b < Np // _BLOCK) & (kept_cnt < max_keep) & (b * _BLOCK < num_valid)

    def body(state):
        kept, kept_cnt, b = state
        start = b * _BLOCK
        blk = lax.dynamic_slice(sb, (start, 0), (_BLOCK, 5))
        cols = overlap_fn(sb, blk) > thresh  # (Np, K) streamed overlaps
        earlier = (iota_n < start)[:, None]
        incoming = jnp.any(cols & kept[:, None] & earlier, axis=0)
        blk_mat = lax.dynamic_slice(cols, (start, 0), (_BLOCK, _BLOCK))
        s = incoming
        for i in range(_BLOCK):
            s = s | ((~s[i]) & blk_mat[i] & (iota_k > i))
        keep_blk = (~s) & (start + iota_k < num_valid)
        kept = lax.dynamic_update_slice(kept, keep_blk, (start,))
        return kept, kept_cnt + jnp.sum(keep_blk), b + 1

    kept, _, _ = lax.while_loop(
        cond, body,
        (jnp.zeros((Np,), bool), jnp.asarray(0, jnp.int32), jnp.asarray(0, jnp.int32)))
    kept = kept[:N]
    count = jnp.sum(kept).astype(jnp.int32)

    # first max_keep kept ranks, in score order
    rank = jnp.arange(N, dtype=jnp.int32)
    key = jnp.where(kept, -rank, -(N + 1))
    top = lax.top_k(key, min(max_keep, N))[0]
    sel_rank = -top  # ascending kept ranks, padded with N+1
    slot_valid = jnp.arange(min(max_keep, N)) < count
    sel_rank = jnp.where(slot_valid, sel_rank, sel_rank[0])
    idx = order[jnp.clip(sel_rank, 0, N - 1)].astype(jnp.int32)
    if max_keep > N:
        idx = jnp.pad(idx, (0, max_keep - N), mode='edge')
    count = jnp.minimum(count, max_keep)
    return idx, count
