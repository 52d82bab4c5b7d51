"""Loss functions: Dice, sigmoid focal, and the bin-based regression loss
with the consistency-enforcing (CE) soft-IoU term.

Re-implements ``/root/reference/lib/utils/loss_utils.py`` (DiceLoss :8-23,
SigmoidFocalClassificationLoss :26-87, get_reg_loss :90-350) as pure jnp.
The reference computes regression losses on a dynamically-sized foreground
subset (boolean indexing); here every term is computed densely over all rows
and reduced as a masked mean, which is numerically identical.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp

from .ops.bbox_codec import encode_targets

PI = math.pi


def dice_loss(logits: jnp.ndarray, target: jnp.ndarray, ignore_target: float = -1) -> jnp.ndarray:
    """1 - soft IoU between sigmoid(logits) and {0,1} targets (loss_utils.py:8-23)."""
    p = jax.nn.sigmoid(logits.reshape(-1))
    t = target.reshape(-1).astype(p.dtype)
    mask = (t != ignore_target).astype(p.dtype)
    num = jnp.sum(jnp.minimum(p, t) * mask)
    den = jnp.clip(jnp.sum(jnp.maximum(p, t) * mask), 1.0, None)
    return 1.0 - num / den


def sigmoid_cross_entropy_with_logits(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """TF-style stable formulation (loss_utils.py:79-87)."""
    labels = labels.astype(logits.dtype)
    return jnp.clip(logits, 0.0, None) - logits * labels + jnp.log1p(jnp.exp(-jnp.abs(logits)))


def sigmoid_focal_loss(
    logits: jnp.ndarray,
    targets: jnp.ndarray,
    weights: jnp.ndarray,
    gamma: float = 2.0,
    alpha: float = 0.25,
) -> jnp.ndarray:
    """Per-element focal loss (loss_utils.py:26-76). Caller sums/normalizes."""
    ce = sigmoid_cross_entropy_with_logits(logits, targets)
    p = jax.nn.sigmoid(logits)
    p_t = targets * p + (1 - targets) * (1 - p)
    mod = jnp.power(1.0 - p_t, gamma) if gamma else 1.0
    alpha_w = targets * alpha + (1 - targets) * (1 - alpha)
    return mod * alpha_w * ce * weights


def binary_cross_entropy(probs: jnp.ndarray, targets: jnp.ndarray, weight=None) -> jnp.ndarray:
    """Elementwise BCE on probabilities (torch F.binary_cross_entropy, reduction='none').
    Log terms are floored like torch's -100 clamp; the floor is applied to the
    probability BEFORE the log so gradients stay finite (clip(log(0)) would
    backprop 0 * inf = NaN)."""
    tiny = 1e-12  # 1/tiny must stay finite in f32 so the clamped grad is 0, not NaN
    logp = jnp.log(jnp.clip(probs, tiny, None))
    lognp = jnp.log(jnp.clip(1.0 - probs, tiny, None))
    out = -(targets * logp + (1 - targets) * lognp)
    if weight is not None:
        out = out * weight
    return out


def smooth_l1(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """Elementwise huber with beta=1 (torch F.smooth_l1_loss, reduction='none')."""
    d = jnp.abs(pred - target)
    return jnp.where(d < 1.0, 0.5 * d * d, d - 0.5)


def softmax_cross_entropy_int(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """Per-row CE with integer labels (torch F.cross_entropy, reduction='none')."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    return -jnp.take_along_axis(logp, labels[:, None], axis=-1)[:, 0]


def _masked_mean(x: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Mean over rows where mask=1; exactly 0 when the mask is empty."""
    mask = mask.astype(x.dtype)
    return jnp.sum(x * mask) / jnp.clip(jnp.sum(mask), 1.0, None)


def get_reg_loss(
    cls_score: jnp.ndarray,
    mask_score: jnp.ndarray,
    pred_reg: jnp.ndarray,
    reg_label: jnp.ndarray,
    fg_mask: jnp.ndarray,
    loc_scope: float,
    loc_bin_size: float,
    num_head_bin: int,
    anchor_size: jnp.ndarray,
    get_xz_fine: bool = True,
    get_y_by_bin: bool = False,
    loc_y_scope: float = 0.5,
    loc_y_bin_size: float = 0.25,
    get_ry_fine: bool = False,
    use_cls_score: bool = False,
    use_mask_score: bool = False,
    use_iou_branch: bool = False,
    iou_branch_pred: Optional[jnp.ndarray] = None,
    iou_loss_type: str = 'cls_mask_with_bin',
):
    """Bin-based box regression loss + CE (soft-IoU) loss over masked rows.

    All rows are evaluated; ``fg_mask`` (N,) selects which contribute. Mirrors
    ``get_reg_loss`` (loss_utils.py:90-350) with mean-over-foreground
    reductions. Returns (loc, angle, size, iou, dict); dict includes
    'iou_branch_loss' when ``use_iou_branch``.
    """
    n_bin = int(loc_scope / loc_bin_size) * 2
    y_bin_num = int(loc_y_scope / loc_y_bin_size) * 2
    dtype = pred_reg.dtype
    t = encode_targets(
        reg_label, anchor_size, loc_scope, loc_bin_size, num_head_bin,
        get_y_by_bin=get_y_by_bin, loc_y_scope=loc_y_scope,
        loc_y_bin_size=loc_y_bin_size, get_ry_fine=get_ry_fine)

    reg_loss_dict = {}
    start = 0
    x_bin_logits = pred_reg[:, 0:n_bin]
    z_bin_logits = pred_reg[:, n_bin:2 * n_bin]
    start = 2 * n_bin

    loss_x_bin = _masked_mean(softmax_cross_entropy_int(x_bin_logits, t.x_bin), fg_mask)
    loss_z_bin = _masked_mean(softmax_cross_entropy_int(z_bin_logits, t.z_bin), fg_mask)
    loc_loss = loss_x_bin + loss_z_bin
    reg_loss_dict['loss_x_bin'] = loss_x_bin
    reg_loss_dict['loss_z_bin'] = loss_z_bin

    x_res_slots = z_res_slots = None
    if get_xz_fine:
        x_res_slots = pred_reg[:, start:start + n_bin]
        z_res_slots = pred_reg[:, start + n_bin:start + 2 * n_bin]
        start = start + 2 * n_bin
        x_onehot = jax.nn.one_hot(t.x_bin, n_bin, dtype=dtype)
        z_onehot = jax.nn.one_hot(t.z_bin, n_bin, dtype=dtype)
        pred_x_res = jnp.sum(x_res_slots * x_onehot, axis=1)
        pred_z_res = jnp.sum(z_res_slots * z_onehot, axis=1)
        loss_x_res = _masked_mean(smooth_l1(pred_x_res, t.x_res_norm), fg_mask)
        loss_z_res = _masked_mean(smooth_l1(pred_z_res, t.z_res_norm), fg_mask)
        loc_loss = loc_loss + loss_x_res + loss_z_res
        reg_loss_dict['loss_x_res'] = loss_x_res
        reg_loss_dict['loss_z_res'] = loss_z_res

    if get_y_by_bin:
        y_bin_logits = pred_reg[:, start:start + y_bin_num]
        y_res_slots = pred_reg[:, start + y_bin_num:start + 2 * y_bin_num]
        start = start + 2 * y_bin_num
        y_onehot = jax.nn.one_hot(t.y_bin, y_bin_num, dtype=dtype)
        loss_y_bin = _masked_mean(softmax_cross_entropy_int(y_bin_logits, t.y_bin), fg_mask)
        loss_y_res = _masked_mean(
            smooth_l1(jnp.sum(y_res_slots * y_onehot, axis=1), t.y_res_norm), fg_mask)
        loc_loss = loc_loss + loss_y_bin + loss_y_res
        reg_loss_dict['loss_y_bin'] = loss_y_bin
        reg_loss_dict['loss_y_res'] = loss_y_res
        pred_y = jnp.zeros_like(t.y_offset)  # CE loss path requires the offset format
    else:
        y_slot = pred_reg[:, start:start + 1]
        start = start + 1
        pred_y = jnp.sum(y_slot, axis=1)
        loss_y_offset = _masked_mean(smooth_l1(pred_y, t.y_offset), fg_mask)
        loc_loss = loc_loss + loss_y_offset
        reg_loss_dict['loss_y_offset'] = loss_y_offset

    # angle
    H = num_head_bin
    ry_bin_logits = pred_reg[:, start:start + H]
    ry_res_slots = pred_reg[:, start + H:start + 2 * H]
    start = start + 2 * H
    ry_onehot = jax.nn.one_hot(t.ry_bin, H, dtype=dtype)
    loss_ry_bin = _masked_mean(softmax_cross_entropy_int(ry_bin_logits, t.ry_bin), fg_mask)
    loss_ry_res = _masked_mean(
        smooth_l1(jnp.sum(ry_res_slots * ry_onehot, axis=1), t.ry_res_norm), fg_mask)
    angle_loss = loss_ry_bin + loss_ry_res
    reg_loss_dict['loss_ry_bin'] = loss_ry_bin
    reg_loss_dict['loss_ry_res'] = loss_ry_res

    # size
    size_res_norm = pred_reg[:, start:start + 3]
    assert start + 3 == pred_reg.shape[1], f'{start + 3} vs {pred_reg.shape[1]}'
    size_loss = _masked_mean(jnp.mean(smooth_l1(size_res_norm, t.size_res_norm), axis=1), fg_mask)

    # ---- consistency-enforcing (soft axis-aligned IoU) loss -------------
    pred_size = size_res_norm * anchor_size + anchor_size  # (N, 3) h, w, l
    tar_size = reg_label[:, 3:6]

    if iou_loss_type == 'raw':
        # residual-frame IoU (loss_utils.py:235-261): pred/tar positions are
        # the gt-bin residuals.
        x_onehot = jax.nn.one_hot(t.x_bin, n_bin, dtype=dtype)
        z_onehot = jax.nn.one_hot(t.z_bin, n_bin, dtype=dtype)
        pred_x = jnp.sum(x_res_slots * x_onehot, axis=1) * loc_bin_size
        pred_z = jnp.sum(z_res_slots * z_onehot, axis=1) * loc_bin_size
        tar_x, tar_y, tar_z = t.x_res, t.y_offset, t.z_res
    elif iou_loss_type == 'cls_mask_with_bin':
        # absolute-frame IoU with soft bin expectation (loss_utils.py:282-321)
        centers = jnp.arange(n_bin, dtype=dtype) * loc_bin_size + loc_bin_size / 2 - loc_scope
        px_bin = jax.nn.softmax(x_bin_logits, axis=1)
        pz_bin = jax.nn.softmax(z_bin_logits, axis=1)
        pred_x = jnp.sum((centers + x_res_slots * loc_bin_size) * px_bin, axis=1)
        pred_z = jnp.sum((centers + z_res_slots * loc_bin_size) * pz_bin, axis=1)
        tar_x = centers[t.x_bin] + t.x_res
        tar_z = centers[t.z_bin] + t.z_res
        tar_y = t.y_offset
    else:
        raise NotImplementedError(iou_loss_type)

    def overlap_1d(pc, ps, tc, ts):
        lo = jnp.maximum(pc - ps / 2, tc - ts / 2)
        hi = jnp.minimum(pc + ps / 2, tc + ts / 2)
        return jnp.clip(hi - lo, 1e-3, None)

    # extent mapping (loss_utils.py:243-251): x<->l, y<->h, z<->w
    ix = overlap_1d(pred_x, pred_size[:, 2], tar_x, tar_size[:, 2])
    iy = overlap_1d(pred_y, pred_size[:, 0], tar_y, tar_size[:, 0])
    iz = overlap_1d(pred_z, pred_size[:, 1], tar_z, tar_size[:, 1])
    insect = ix * iy * iz
    pred_area = jnp.clip(pred_size[:, 0] * pred_size[:, 1] * pred_size[:, 2], 1e-3, None)
    tar_area = tar_size[:, 0] * tar_size[:, 1] * tar_size[:, 2]
    iou_tmp = insect / (pred_area + tar_area - insect)

    if use_iou_branch:
        p = jnp.clip(iou_branch_pred.reshape(-1), 1e-4, 1 - 1e-4)
        tgt = jax.lax.stop_gradient(jnp.clip(iou_tmp, 1e-4, 1 - 1e-4))
        reg_loss_dict['iou_branch_loss'] = _masked_mean(
            -(tgt * jnp.log(p) + (1 - tgt) * jnp.log(1 - p)), fg_mask)

    if use_cls_score:
        iou_tmp = cls_score * iou_tmp
    iou_tmp = jnp.clip(iou_tmp, 1e-4, None)
    iou_loss = _masked_mean(-jnp.log(iou_tmp), fg_mask)

    reg_loss_dict['loss_loc'] = loc_loss
    reg_loss_dict['loss_angle'] = angle_loss
    reg_loss_dict['loss_size'] = size_loss
    reg_loss_dict['loss_iou'] = iou_loss
    return loc_loss, angle_loss, size_loss, iou_loss, reg_loss_dict
