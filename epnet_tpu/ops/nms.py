"""Greedy BEV NMS with fixed-size padded outputs.

The reference computes an N x N/64 suppression bitmask on GPU and then runs a
serial greedy scan on the CPU (``/root/reference/lib/utils/iou3d/src/
iou3d_kernel.cu:250-348`` + ``iou3d.cpp:105-116``), returning a
variable-length keep list. Here the whole thing stays on device with static
shapes:

  * the pairwise overlap matrix is computed in one vectorized pass
    (axis-aligned or exact rotated IoU),
  * the inherently-sequential greedy scan is blocked: an outer ``fori_loop``
    over K-sized blocks does one (N, K) masked reduction to import
    suppression from earlier blocks, then an unrolled K-step chain resolves
    suppression inside the block. Exactly the greedy result, but the
    sequential depth in *loop iterations* drops from N to N/K.
  * the keep list is returned as (max_keep,) indices + a count, padded with
    the first kept index.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
from jax import lax

from .rotated_iou import boxes_iou_bev, iou_axis_aligned

_BLOCK = 64


def greedy_suppress(over: jnp.ndarray) -> jnp.ndarray:
    """Greedy scan over a score-ordered (N, N) bool 'overlaps above threshold'
    matrix. Returns (N,) bool keep flags. Row/col order is score order."""
    N = over.shape[0]
    pad = (-N) % _BLOCK
    if pad:
        over = jnp.pad(over, ((0, pad), (0, pad)))
    Np = N + pad
    n_blocks = Np // _BLOCK
    iota_n = jnp.arange(Np)
    iota_k = jnp.arange(_BLOCK)

    def body(b, kept):
        start = b * _BLOCK
        cols = lax.dynamic_slice(over, (0, start), (Np, _BLOCK))  # (Np, K)
        earlier = (iota_n < start)[:, None]
        incoming = jnp.any(cols & kept[:, None] & earlier, axis=0)  # (K,)
        blk = lax.dynamic_slice(over, (start, start), (_BLOCK, _BLOCK))
        s = incoming
        for i in range(_BLOCK):
            s = s | ((~s[i]) & blk[i] & (iota_k > i))
        return lax.dynamic_update_slice(kept, ~s, (start,))

    kept = lax.fori_loop(0, n_blocks, body, jnp.zeros((Np,), dtype=bool))
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
    result to the highest-scoring ``num_valid`` inputs — used by callers that
    pad candidate sets with -inf-score dummies.
    """
    N = boxes_bev.shape[0]
    order = jnp.argsort(-scores)
    sorted_boxes = boxes_bev[order]

    if rotated:
        iou = boxes_iou_bev(sorted_boxes, sorted_boxes)
    else:
        iou = iou_axis_aligned(sorted_boxes, sorted_boxes)
    over = iou > thresh

    kept = greedy_suppress(over)
    if num_valid is not None:
        kept = kept & (jnp.arange(N) < num_valid)
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
