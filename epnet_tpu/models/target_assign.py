"""Train-time RCNN target assignment: roi sampling, noise augmentation,
pooling, canonical transform — all jittable with fixed shapes.

Rebuild of ``/root/reference/lib/rpn/proposal_target_layer.py`` (forward
:14-83, sample_rois_for_rcnn :85-189, sample_bg_inds :191-218,
aug_roi_by_noise :220-247, random_aug_box3d :249-290, per-roi augmentation
:292-349). The reference's python while-loops and variable-length index
lists become masked fixed-size tensors:

  * fg/bg sampling: random keys + top_k give a uniform without-replacement
    subset; with-replacement draws are randint-mod-count gathers,
  * the "augment until IoU >= thresh, up to 10 tries" loop becomes a fixed
    batch of 10 candidates with a first-success argmax,
  * branch structure (fg-only / bg-only / mixed image) becomes arithmetic
    on counts.

RNG note: the reference draws from torch/numpy global RNG; here every draw
comes from an explicit ``jax.random`` key, so runs are reproducible and the
sampling is identical in distribution (not bit-for-bit).
"""

from __future__ import annotations

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from ..config import Config
from ..ops.boxes import rotate_points_along_y
from ..ops.pointops import _resolve_exact
from ..ops.roipool3d import roipool3d
from ..ops.rotated_iou import boxes_iou3d

PI = math.pi


class RCNNTargets(NamedTuple):
    sampled_pts: jnp.ndarray     # (B*R, S, 3) canonical-frame points
    pts_feature: jnp.ndarray     # (B*R, S, C)
    cls_label: jnp.ndarray       # (B*R,) {1, 0, -1}
    mask_score: jnp.ndarray      # (B*R,)
    reg_valid_mask: jnp.ndarray  # (B*R,) {0, 1}
    gt_of_rois: jnp.ndarray      # (B*R, 7) canonical-frame gt
    gt_iou: jnp.ndarray          # (B*R,)
    roi_boxes3d: jnp.ndarray     # (B*R, 7)


def _rand_subset(key, mask, k):
    """k random indices from mask's True positions, without replacement;
    returns (idx (k,), count)."""
    n = mask.shape[0]
    u = jax.random.uniform(key, (n,))
    keys = jnp.where(mask, u, -jnp.inf)
    _, idx = lax.top_k(keys, k)
    cnt = jnp.minimum(jnp.sum(mask), k).astype(jnp.int32)
    return idx.astype(jnp.int32), cnt


def _list_of(mask, cap):
    """First `cap` True indices + count (for with-replacement draws)."""
    n = mask.shape[0]
    iota = jnp.arange(n, dtype=jnp.int32)
    neg, _ = lax.top_k(jnp.where(mask, -iota, -(n + 1)), cap)
    return -neg, jnp.minimum(jnp.sum(mask), cap).astype(jnp.int32)


def _random_aug_box3d(key, box, cfg: Config):
    """One noisy variant of a roi box (random_aug_box3d :249-290)."""
    method = cfg.RCNN.REG_AUG_METHOD
    k1, k2, k3, k4 = jax.random.split(key, 4)
    if method == 'single':
        pos = jax.random.uniform(k1, (3,)) - 0.5
        hwl = (jax.random.uniform(k2, (3,)) - 0.5) / (0.5 / 0.15) + 1.0
        ang = (jax.random.uniform(k3, (1,)) - 0.5) / (0.5 / (PI / 12))
        return jnp.concatenate([box[0:3] + pos, box[3:6] * hwl, box[6:7] + ang])
    if method == 'multiple':
        table = jnp.asarray([
            [0.2, 0.1, PI / 12], [0.3, 0.15, PI / 12], [0.5, 0.15, PI / 9],
            [0.8, 0.15, PI / 6], [1.0, 0.15, PI / 3]], jnp.float32)
        row = table[jax.random.randint(k4, (), 0, 5)]
        pos = (jax.random.uniform(k1, (3,)) - 0.5) / 0.5 * row[0]
        hwl = (jax.random.uniform(k2, (3,)) - 0.5) / 0.5 * row[1] + 1.0
        ang = (jax.random.uniform(k3, (1,)) - 0.5) / 0.5 * row[2]
        return jnp.concatenate([box[0:3] + pos, box[3:6] * hwl, box[6:7] + ang])
    if method == 'normal':
        stds = jnp.asarray([0.3, 0.2, 0.3, 0.25, 0.15, 0.5], jnp.float32)
        shift = jax.random.normal(k1, (6,)) * stds
        ang = (jax.random.uniform(k3, (1,)) - 0.5) / 0.5 * (PI / 12)
        return jnp.concatenate([box[0:6] + shift, box[6:7] + ang])
    raise NotImplementedError(method)


def _aug_rois_by_noise(key, rois, gts, iou_src, aug_times_per_roi, cfg: Config):
    """Vectorized 'retry until IoU >= thresh' (aug_roi_by_noise :220-247).

    :param rois: (R, 7) sampled rois; gts (R, 7) their assigned gt
    :param aug_times_per_roi: (R,) 10 for fg, 1 for bg, 0 disables
    :return: (aug_rois (R, 7), iou_out (R,))
    """
    R = rois.shape[0]
    T = max(cfg.RCNN.ROI_FG_AUG_TIMES, 1)
    pos_thresh = min(cfg.RCNN.REG_FG_THRESH, cfg.RCNN.CLS_FG_THRESH)

    kk, kp = jax.random.split(key)
    keep_p = jax.random.uniform(kp, (R, T)) < 0.2
    cand_keys = jax.random.split(kk, R * T).reshape(R, T, -1)
    aug = jax.vmap(jax.vmap(lambda k, b: _random_aug_box3d(k, b, cfg), in_axes=(0, None)),
                   in_axes=(0, 0))(cand_keys, rois)  # (R, T, 7)
    cands = jnp.where(keep_p[..., None], rois[:, None, :], aug)

    # IoU of every candidate against its own gt: diag of (R*T, R) is wasteful;
    # use the pairwise kernel on aligned pairs via a 1-vs-1 reshape.
    flat = cands.reshape(R * T, 7)
    gt_rep = jnp.repeat(gts, T, axis=0)
    iou_all = jax.vmap(lambda a, g: boxes_iou3d(a[None], g[None])[0, 0])(flat, gt_rep)
    iou_all = iou_all.reshape(R, T)

    tries = jnp.arange(T)
    valid_try = tries[None, :] < aug_times_per_roi[:, None]
    success = valid_try & (iou_all >= pos_thresh)
    first_ok = jnp.argmax(success, axis=1)
    any_ok = jnp.any(success, axis=1)
    last_try = jnp.clip(aug_times_per_roi - 1, 0, T - 1)
    sel = jnp.where(any_ok, first_ok, last_try)

    sel_boxes = jnp.take_along_axis(cands, sel[:, None, None], axis=1)[:, 0]
    sel_iou = jnp.take_along_axis(iou_all, sel[:, None], axis=1)[:, 0]
    sel_keep = jnp.take_along_axis(keep_p, sel[:, None], axis=1)[:, 0]

    no_aug = aug_times_per_roi == 0
    out_boxes = jnp.where(no_aug[:, None], rois, sel_boxes)
    out_iou = jnp.where(no_aug | sel_keep, iou_src, sel_iou)
    return out_boxes, out_iou


def _sample_rois_one(key, rois, gts, gt_valid, cfg: Config):
    """Per-image fg/bg roi sampling (sample_rois_for_rcnn :102-187).

    :param rois: (M, 7); gts (G, 7); gt_valid (G,) bool
    :return: (sampled_rois (R, 7), gt_of_rois (R, 7), roi_iou (R,))
    """
    R = cfg.RCNN.ROI_PER_IMAGE
    fg_per_image = int(round(cfg.RCNN.FG_RATIO * R))
    fg_thresh = min(cfg.RCNN.REG_FG_THRESH, cfg.RCNN.CLS_FG_THRESH)

    iou = boxes_iou3d(rois, gts)  # (M, G)
    iou = jnp.where(gt_valid[None, :], iou, -1.0)
    max_iou = jnp.max(iou, axis=1)
    assign = jnp.argmax(iou, axis=1)

    fg_mask = max_iou >= fg_thresh
    easy_mask = (max_iou < cfg.RCNN.CLS_BG_THRESH_LO)
    hard_mask = (max_iou < cfg.RCNN.CLS_BG_THRESH) & (max_iou >= cfg.RCNN.CLS_BG_THRESH_LO)
    fg_cnt_all = jnp.sum(fg_mask)
    bg_cnt_all = jnp.sum(easy_mask) + jnp.sum(hard_mask)

    k_fg, k_fgwr, k_hard, k_easy, k_aug = jax.random.split(key, 5)

    fg_idx, fg_cnt = _rand_subset(k_fg, fg_mask, R)  # random fg order, w/o replacement
    hard_list, hard_cnt = _list_of(hard_mask, rois.shape[0])
    easy_list, easy_cnt = _list_of(easy_mask, rois.shape[0])

    # number of fg slots (sample_rois_for_rcnn :129-156)
    fg_this = jnp.minimum(fg_per_image, fg_cnt_all)
    fg_this = jnp.where((fg_cnt_all > 0) & (bg_cnt_all == 0), R, fg_this)
    fg_this = jnp.where(fg_cnt_all == 0, 0, fg_this).astype(jnp.int32)

    slots = jnp.arange(R)
    is_fg_slot = slots < fg_this

    # fg picks: first fg_cnt slots come from the random subset; extra slots
    # (fg-only image) draw with replacement
    wr = jax.random.randint(k_fgwr, (R,), 0, 1 << 30) % jnp.clip(fg_cnt_all, 1, None)
    fg_pick = jnp.where(slots < fg_cnt, fg_idx[jnp.clip(slots, 0, R - 1)],
                        fg_idx[jnp.clip(wr % jnp.clip(fg_cnt, 1, None), 0, R - 1)])

    # bg picks (sample_bg_inds :191-218): hard/easy with replacement
    bg_this = R - fg_this
    t = slots - fg_this  # bg-slot ordinal
    hard_num = jnp.floor(bg_this * cfg.RCNN.HARD_BG_RATIO).astype(jnp.int32)
    use_hard = jnp.where(easy_cnt == 0, True, jnp.where(hard_cnt == 0, False, t < hard_num))
    hp = hard_list[jax.random.randint(k_hard, (R,), 0, 1 << 30) % jnp.clip(hard_cnt, 1, None)]
    ep = easy_list[jax.random.randint(k_easy, (R,), 0, 1 << 30) % jnp.clip(easy_cnt, 1, None)]
    bg_pick = jnp.where(use_hard, hp, ep)

    pick = jnp.where(is_fg_slot, fg_pick, bg_pick)

    sel_rois = rois[pick]
    sel_iou = max_iou[pick]
    sel_gt = gts[assign[pick]]

    # noise augmentation: 10 tries for fg, 1 for bg (0 when fg aug disabled)
    bg_aug = 1 if cfg.RCNN.ROI_FG_AUG_TIMES > 0 else 0
    aug_times = jnp.where(is_fg_slot, cfg.RCNN.ROI_FG_AUG_TIMES, bg_aug)
    sel_rois, sel_iou = _aug_rois_by_noise(k_aug, sel_rois, sel_gt, sel_iou, aug_times, cfg)
    return sel_rois, sel_gt, sel_iou


def _per_roi_augmentation(key, pts, rois, gt_of_rois, cfg: Config):
    """Per-roi rotation/scale/flip on pooled points + boxes
    (data_augmentation :292-349). ``pts`` is (B, R, S, 3)."""
    B, R = rois.shape[:2]
    k_rot, k_scale, k_flip = jax.random.split(key, 3)

    # NB: the reference computes (rand - 0.5/0.5) == rand - 1.0, giving
    # angles in [-pi/range, 0]; replicated for training parity.
    angles = (jax.random.uniform(k_rot, (B, R)) - 1.0) * (PI / cfg.AUG_ROT_RANGE)

    def alpha_of(boxes):
        beta = jnp.arctan2(boxes[..., 2], boxes[..., 0])
        return -jnp.sign(beta) * PI / 2 + beta + boxes[..., 6]

    gt_alpha = alpha_of(gt_of_rois)
    roi_alpha = alpha_of(rois)

    pts = rotate_points_along_y(pts, angles[..., None])
    gt_of_rois = rotate_points_along_y(gt_of_rois[:, :, None, :], angles[..., None])[:, :, 0]
    rois = rotate_points_along_y(rois[:, :, None, :], angles[..., None])[:, :, 0]

    def restore_ry(boxes, alpha):
        beta = jnp.arctan2(boxes[..., 2], boxes[..., 0])
        return boxes.at[..., 6].set(jnp.sign(beta) * PI / 2 + alpha - beta)

    gt_of_rois = restore_ry(gt_of_rois, gt_alpha)
    rois = restore_ry(rois, roi_alpha)

    scales = 1 + (jax.random.uniform(k_scale, (B, R)) - 0.5) / 0.5 * 0.05
    pts = pts * scales[..., None, None]
    gt_of_rois = gt_of_rois.at[..., 0:6].multiply(scales[..., None])
    rois = rois.at[..., 0:6].multiply(scales[..., None])

    flip = jnp.sign(jax.random.uniform(k_flip, (B, R)) - 0.5)
    pts = pts.at[..., 0].multiply(flip[..., None])

    def flip_box(boxes):
        boxes = boxes.at[..., 0].multiply(flip)
        ry = boxes[..., 6]
        new_ry = jnp.where(flip == 1, ry, jnp.sign(ry) * PI - ry)
        return boxes.at[..., 6].set(new_ry)

    return pts, flip_box(rois), flip_box(gt_of_rois)


def proposal_target_layer(
    key,
    rois: jnp.ndarray,           # (B, M, 7)
    gt_boxes3d: jnp.ndarray,     # (B, G, 7) zero-padded
    rpn_xyz: jnp.ndarray,        # (B, N, 3)
    rpn_features: jnp.ndarray,   # (B, N, 128)
    seg_mask: jnp.ndarray,       # (B, N)
    pts_depth: jnp.ndarray,      # (B, N)
    cfg: Config,
    rpn_intensity: jnp.ndarray = None,
) -> RCNNTargets:
    """Full train-time target assignment (forward :14-83)."""
    B = rois.shape[0]
    R = cfg.RCNN.ROI_PER_IMAGE
    S = cfg.RCNN.NUM_POINTS

    gt_valid = jnp.any(gt_boxes3d != 0, axis=-1)  # collate zero-padding

    keys = jax.random.split(key, B + 2)
    per_img = jax.vmap(lambda k, r, g, v: _sample_rois_one(k, r, g, v, cfg))
    batch_rois, batch_gt, batch_iou = per_img(keys[:B], rois, gt_boxes3d[..., :7], gt_valid)

    extra = [seg_mask[..., None]]
    if cfg.RCNN.USE_INTENSITY and rpn_intensity is not None:
        extra.insert(0, rpn_intensity[..., None])
    if cfg.RCNN.USE_DEPTH:
        extra.append((pts_depth / 70.0 - 0.5)[..., None])
    pts_extra = jnp.concatenate(extra, axis=-1)

    feats = jnp.concatenate([pts_extra, rpn_features], axis=-1)
    if cfg.MIXED_PRECISION:
        # same narrow-gather policy as the eval path (_pool_for_eval) so the
        # RCNN sees identical input numerics in train and eval
        feats = feats.astype(jnp.bfloat16)
    sampled_pts, sampled_feats, empty_flag, pool_cnt = roipool3d(
        rpn_xyz, feats, batch_rois, cfg.RCNN.POOL_EXTRA_WIDTH, sampled_pt_num=S)
    # mask_score = seg-channel sum over the CYCLICALLY duplicated pool / S
    # (proposal_target_layer.py:43). The exact path's slots already carry the
    # duplication; the approx path stores the distinct points in slots
    # [0, min(cnt, S)) and pads with slot 0, so reproduce the cyclic
    # multiplicity weights floor(S/c) (+1 for the first S mod c slots)
    # explicitly — same statistic over the recovered point set.
    seg = sampled_feats[..., 0].astype(jnp.float32)
    if _resolve_exact(None):
        mask_score = jnp.sum(seg, axis=-1) / S
    else:
        c = jnp.clip(jnp.minimum(pool_cnt, S), 1, None)
        slot = jnp.arange(S, dtype=jnp.int32)
        w = jnp.where(slot[None, None] < c[..., None],
                      (S // c)[..., None] + (slot[None, None] < (S % c)[..., None]),
                      0).astype(jnp.float32)
        mask_score = jnp.sum(seg * w, axis=-1) / S

    if cfg.AUG_DATA:
        sampled_pts, batch_rois, batch_gt = _per_roi_augmentation(
            keys[B], sampled_pts, batch_rois, batch_gt, cfg)

    # canonical transform (forward :51-62)
    roi_ry = batch_rois[..., 6] % (2 * PI)
    roi_center = batch_rois[..., 0:3]
    sampled_pts = sampled_pts - roi_center[:, :, None, :]
    sampled_pts = rotate_points_along_y(sampled_pts, batch_rois[..., 6, None])
    gt_ct = batch_gt.at[..., 0:3].add(-roi_center).at[..., 6].add(-roi_ry)
    gt_ct = rotate_points_along_y(gt_ct[:, :, None, :], roi_ry[..., None])[:, :, 0]

    valid_mask = empty_flag == 0
    reg_valid = ((batch_iou > cfg.RCNN.REG_FG_THRESH) & valid_mask).astype(jnp.int32)
    cls_label = (batch_iou > cfg.RCNN.CLS_FG_THRESH).astype(jnp.int32)
    mid = (batch_iou > cfg.RCNN.CLS_BG_THRESH) & (batch_iou < cfg.RCNN.CLS_FG_THRESH)
    cls_label = jnp.where(~valid_mask | mid, -1, cls_label)

    C = sampled_feats.shape[-1]
    return RCNNTargets(
        sampled_pts=sampled_pts.reshape(B * R, S, 3),
        pts_feature=sampled_feats.reshape(B * R, S, C),
        cls_label=cls_label.reshape(-1),
        mask_score=mask_score.reshape(-1),
        reg_valid_mask=reg_valid.reshape(-1),
        gt_of_rois=gt_ct.reshape(B * R, 7),
        gt_iou=batch_iou.reshape(-1),
        roi_boxes3d=batch_rois.reshape(B * R, 7),
    )
