"""Proposal generation: decode per-point boxes, distance-partitioned NMS,
fixed-size padded RoI output.

Rebuild of ``/root/reference/lib/rpn/proposal_layer.py`` (decode :23-31,
distance-based proposals :58-119, score-based :121-142). The reference
loops over batch elements and uses variable-length keep lists; here each
batch element is processed by the same fixed-shape program under
``lax.map`` and every list is a padded tensor + count.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax

from ..config import Config
from ..ops.bbox_codec import decode_bbox_target
from ..ops.boxes import boxes3d_to_bev
from ..ops.nms import nms_bev

NMS_RANGES = (0.0, 40.0, 80.0)  # proposal_layer.py:65


def _first_k_masked(mask: jnp.ndarray, k: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Indices of the first k True positions (ascending), padded with 0;
    plus the valid count (<= k)."""
    n = mask.shape[0]
    iota = jnp.arange(n, dtype=jnp.int32)
    key = jnp.where(mask, iota, n)
    neg, _ = lax.top_k(-key, k)
    idx = -neg
    cnt = jnp.minimum(jnp.sum(mask), k).astype(jnp.int32)
    return jnp.where(jnp.arange(k) < cnt, idx, 0), cnt


def _range_nms(props, scores, cand_idx, cand_cnt, nms_thresh, post_n, rotated):
    """NMS over a fixed-size candidate set with only the first cand_cnt valid.

    Returns (boxes (post_n, 7), scores (post_n,), count)."""
    k = cand_idx.shape[0]
    cboxes = props[cand_idx]
    cscores = jnp.where(jnp.arange(k) < cand_cnt, scores[cand_idx], -jnp.inf)
    # park invalid candidates far away so they can never suppress real ones
    cboxes = jnp.where((jnp.arange(k) < cand_cnt)[:, None], cboxes,
                       jnp.asarray([1e6, 0, 1e6, 1, 1, 1, 0], cboxes.dtype))
    bev = boxes3d_to_bev(cboxes)
    keep_idx, keep_cnt = nms_bev(bev, cscores, nms_thresh, max_keep=post_n,
                                 rotated=rotated, num_valid=cand_cnt)
    out_boxes = cboxes[keep_idx]
    out_scores = cscores[keep_idx]
    slot_ok = jnp.arange(post_n) < keep_cnt
    return (jnp.where(slot_ok[:, None], out_boxes, 0.0),
            jnp.where(slot_ok, out_scores, 0.0),
            keep_cnt)


class ProposalLayer:
    """Functional (jittable) proposal layer; mode selects TRAIN/TEST knobs."""

    def __init__(self, cfg: Config, mode: str = 'TRAIN'):
        self.cfg = cfg
        self.mode = mode
        self.mcfg = cfg.get(mode)

    def __call__(self, rpn_scores: jnp.ndarray, rpn_reg: jnp.ndarray, xyz: jnp.ndarray):
        """
        :param rpn_scores: (B, N) raw logits
        :param rpn_reg: (B, N, C)
        :param xyz: (B, N, 3)
        :return: (rois (B, POST, 7), roi_scores_raw (B, POST), counts (B,))
        """
        cfg = self.cfg
        B, N = rpn_scores.shape
        mean_size = jnp.asarray(cfg.CLS_MEAN_SIZE[0], rpn_reg.dtype)
        props = decode_bbox_target(
            xyz.reshape(-1, 3), rpn_reg.reshape(B * N, -1), mean_size,
            loc_scope=cfg.RPN.LOC_SCOPE, loc_bin_size=cfg.RPN.LOC_BIN_SIZE,
            num_head_bin=cfg.RPN.NUM_HEAD_BIN, get_xz_fine=cfg.RPN.LOC_XZ_FINE,
            get_y_by_bin=False, get_ry_fine=False,
            bbox_avg_by_bin=cfg.TRAIN.BBOX_AVG_BY_BIN,
            ry_with_bin=self.mcfg.RY_WITH_BIN)
        # shift y to the box bottom (proposal_layer.py:31)
        props = props.at[:, 1].add(props[:, 3] / 2).reshape(B, N, 7)

        fn = functools.partial(self._single)
        rois, scores, counts = lax.map(lambda t: fn(*t), (rpn_scores, props))
        return rois, scores, counts

    def _single(self, scores, props):
        cfg, mcfg = self.cfg, self.mcfg
        order = jnp.argsort(-scores)
        scores_o = scores[order]
        props_o = props[order]
        rotated = cfg.RPN.NMS_TYPE == 'rotate'

        if mcfg.RPN_DISTANCE_BASED_PROPOSE:
            pre, post = mcfg.RPN_PRE_NMS_TOP_N, mcfg.RPN_POST_NMS_TOP_N
            pre_ns = (int(pre * 0.7), pre - int(pre * 0.7))
            post_ns = (int(post * 0.7), post - int(post * 0.7))
            dist = props_o[:, 2]
            m1 = (dist > NMS_RANGES[0]) & (dist <= NMS_RANGES[1])
            m2 = (dist > NMS_RANGES[1]) & (dist <= NMS_RANGES[2])

            idx1, cnt1 = _first_k_masked(m1, min(pre_ns[0], scores.shape[0]))
            b1, s1, c1 = _range_nms(props_o, scores_o, idx1, cnt1,
                                    mcfg.RPN_NMS_THRESH, post_ns[0], rotated)

            # far range; when empty, reuse near-range candidates ranked
            # [pre_n1 : pre_n1 + pre_n2] (proposal_layer.py:92-100)
            k2 = min(pre_ns[1], scores.shape[0])
            idx2, cnt2 = _first_k_masked(m2, k2)
            idx1_ext, cnt1_ext = _first_k_masked(m1, min(pre_ns[0] + pre_ns[1], scores.shape[0]))
            # pad so the [pre_n1 : pre_n1+k2] slice always exists even when
            # NUM_POINTS < pre_n1 + k2; fb_cnt <= cnt1_ext - pre_n1 keeps the
            # padded zero slots masked off inside _range_nms
            pad = pre_ns[0] + k2 - idx1_ext.shape[0]
            if pad > 0:
                idx1_ext = jnp.pad(idx1_ext, (0, pad))
            fb_idx = lax.dynamic_slice_in_dim(idx1_ext, pre_ns[0], k2)
            fb_cnt = jnp.clip(cnt1_ext - pre_ns[0], 0, k2)
            use_fb = cnt2 == 0
            idx2 = jnp.where(use_fb, fb_idx, idx2)
            cnt2 = jnp.where(use_fb, fb_cnt, cnt2)
            b2, s2, c2 = _range_nms(props_o, scores_o, idx2, cnt2,
                                    mcfg.RPN_NMS_THRESH, post_ns[1], rotated)

            # concatenate ranges compactly (range-2 keeps start right after
            # range-1's c1 entries, like torch.cat of ragged lists)
            boxes = jnp.zeros((post, 7), props.dtype).at[:post_ns[0]].set(b1)
            scr = jnp.zeros((post,), scores.dtype).at[:post_ns[0]].set(s1)
            valid2 = jnp.arange(post_ns[1]) < c2
            tgt = jnp.where(valid2, c1 + jnp.arange(post_ns[1]), post)  # 'post' drops
            boxes = boxes.at[tgt].set(b2, mode='drop')
            scr = scr.at[tgt].set(s2, mode='drop')
            return boxes, scr, c1 + c2

        # plain score-based proposals (proposal_layer.py:121-142)
        pre, post = mcfg.RPN_PRE_NMS_TOP_N, mcfg.RPN_POST_NMS_TOP_N
        k = min(pre, scores.shape[0])
        idx = jnp.arange(k, dtype=jnp.int32)
        cnt = jnp.asarray(k, jnp.int32)
        return _range_nms(props_o, scores_o, idx, cnt, mcfg.RPN_NMS_THRESH, post, rotated=True)
