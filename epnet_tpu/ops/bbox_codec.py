"""Bin-based 3D box encode/decode.

Re-implements the reference's ``decode_bbox_target``
(``/root/reference/lib/utils/bbox_transform.py:25-259``) and the target
encoding implicit in ``get_reg_loss`` (``lib/utils/loss_utils.py:113-233``)
as pure jittable functions over fixed-size channel layouts.

Channel layout of ``pred_reg`` (C channels):
  [x_bin (n) | z_bin (n) | x_res (n)? | z_res (n)? | y_bin/res or y_offset |
   ry_bin (H) | ry_res (H) | size_res (3)]
with n = per_loc_bin_num = 2*loc_scope/loc_bin_size and H = num_head_bin.
"""

from __future__ import annotations

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp

from .boxes import rotate_points_along_y

PI = math.pi


class BinTargets(NamedTuple):
    """Integer bin labels + normalized residual labels for the reg loss."""

    x_bin: jnp.ndarray
    z_bin: jnp.ndarray
    x_res_norm: jnp.ndarray  # residual / loc_bin_size
    z_res_norm: jnp.ndarray
    x_res: jnp.ndarray       # un-normalized (= x_shift - bin center), used by CE loss
    z_res: jnp.ndarray
    y_offset: jnp.ndarray
    y_bin: jnp.ndarray
    y_res_norm: jnp.ndarray
    ry_bin: jnp.ndarray
    ry_res_norm: jnp.ndarray
    size_res_norm: jnp.ndarray  # (N, 3)


def encode_targets(
    reg_label: jnp.ndarray,
    anchor_size: jnp.ndarray,
    loc_scope: float,
    loc_bin_size: float,
    num_head_bin: int,
    get_y_by_bin: bool = False,
    loc_y_scope: float = 0.5,
    loc_y_bin_size: float = 0.25,
    get_ry_fine: bool = False,
) -> BinTargets:
    """Compute bin/residual labels from (N, 7) offsets [dx, dy, dz, h, w, l, ry].

    Mirrors the label arithmetic inside ``get_reg_loss``
    (loss_utils.py:119-233).
    """
    dx, dy, dz = reg_label[:, 0], reg_label[:, 1], reg_label[:, 2]
    x_shift = jnp.clip(dx + loc_scope, 0.0, loc_scope * 2 - 1e-3)
    z_shift = jnp.clip(dz + loc_scope, 0.0, loc_scope * 2 - 1e-3)
    x_bin = jnp.floor(x_shift / loc_bin_size).astype(jnp.int32)
    z_bin = jnp.floor(z_shift / loc_bin_size).astype(jnp.int32)
    x_res = x_shift - (x_bin.astype(x_shift.dtype) * loc_bin_size + loc_bin_size / 2)
    z_res = z_shift - (z_bin.astype(z_shift.dtype) * loc_bin_size + loc_bin_size / 2)

    if get_y_by_bin:
        y_shift = jnp.clip(dy + loc_y_scope, 0.0, loc_y_scope * 2 - 1e-3)
        y_bin = jnp.floor(y_shift / loc_y_bin_size).astype(jnp.int32)
        y_res = y_shift - (y_bin.astype(y_shift.dtype) * loc_y_bin_size + loc_y_bin_size / 2)
        y_res_norm = y_res / loc_y_bin_size
    else:
        y_bin = jnp.zeros_like(x_bin)
        y_res_norm = jnp.zeros_like(dy)

    ry = reg_label[:, 6]
    if get_ry_fine:
        # RCNN: fold opposite headings together, bins over (0, pi/2)
        angle_per_class = (PI / 2) / num_head_bin
        ry_n = ry % (2 * PI)
        opposite = (ry_n > PI * 0.5) & (ry_n < PI * 1.5)
        ry_n = jnp.where(opposite, (ry_n + PI) % (2 * PI), ry_n)
        shift_angle = (ry_n + PI * 0.5) % (2 * PI)
        shift_angle = jnp.clip(shift_angle - PI * 0.25, 1e-3, PI * 0.5 - 1e-3)
        ry_bin = jnp.floor(shift_angle / angle_per_class).astype(jnp.int32)
        ry_res = shift_angle - (ry_bin.astype(ry.dtype) * angle_per_class + angle_per_class / 2)
    else:
        # RPN: bins over the full circle, bin centers at k * angle_per_class
        angle_per_class = (2 * PI) / num_head_bin
        heading = ry % (2 * PI)
        shift_angle = (heading + angle_per_class / 2) % (2 * PI)
        ry_bin = jnp.floor(shift_angle / angle_per_class).astype(jnp.int32)
        ry_res = shift_angle - (ry_bin.astype(ry.dtype) * angle_per_class + angle_per_class / 2)
    ry_res_norm = ry_res / (angle_per_class / 2)

    size_res_norm = (reg_label[:, 3:6] - anchor_size) / anchor_size

    return BinTargets(
        x_bin=x_bin, z_bin=z_bin,
        x_res_norm=x_res / loc_bin_size, z_res_norm=z_res / loc_bin_size,
        x_res=x_res, z_res=z_res,
        y_offset=dy, y_bin=y_bin, y_res_norm=y_res_norm,
        ry_bin=ry_bin, ry_res_norm=ry_res_norm,
        size_res_norm=size_res_norm,
    )


def decode_bbox_target(
    roi_box3d: jnp.ndarray,
    pred_reg: jnp.ndarray,
    anchor_size: jnp.ndarray,
    loc_scope: float,
    loc_bin_size: float,
    num_head_bin: int,
    get_xz_fine: bool = True,
    get_y_by_bin: bool = False,
    loc_y_scope: float = 0.5,
    loc_y_bin_size: float = 0.25,
    get_ry_fine: bool = False,
    bbox_avg_by_bin: bool = False,
    ry_with_bin: bool = False,
) -> jnp.ndarray:
    """Decode (N, C) regression predictions against (N, 3|7) anchors -> (N, 7).

    Faithful port of ``decode_bbox_target`` (bbox_transform.py:25-259),
    including the soft bin-expectation decode (``BBOX_AVG_BY_BIN``,
    bbox_transform.py:72-105) and the left/right softmax ry decode
    (``RY_WITH_BIN``, bbox_transform.py:145-241).
    """
    n_bin = int(loc_scope / loc_bin_size) * 2
    y_bin_num = int(loc_y_scope / loc_y_bin_size) * 2
    dtype = pred_reg.dtype

    x_bin_l, z_bin_l = 0, n_bin
    start = n_bin * 2

    if not bbox_avg_by_bin:
        x_bin = jnp.argmax(pred_reg[:, x_bin_l:x_bin_l + n_bin], axis=1)
        z_bin = jnp.argmax(pred_reg[:, z_bin_l:z_bin_l + n_bin], axis=1)
        pos_x = x_bin.astype(dtype) * loc_bin_size + loc_bin_size / 2 - loc_scope
        pos_z = z_bin.astype(dtype) * loc_bin_size + loc_bin_size / 2 - loc_scope
        if get_xz_fine:
            x_res = jnp.take_along_axis(pred_reg[:, start:start + n_bin], x_bin[:, None], axis=1)[:, 0]
            z_res = jnp.take_along_axis(pred_reg[:, start + n_bin:start + 2 * n_bin], z_bin[:, None], axis=1)[:, 0]
            pos_x = pos_x + x_res * loc_bin_size
            pos_z = pos_z + z_res * loc_bin_size
            start = start + 2 * n_bin
    else:
        # soft decode: expectation of (bin_center + res) under the bin softmax
        assert get_xz_fine, 'BBOX_AVG_BY_BIN only supports the fine (bin+res) format'
        px_bin = jax.nn.softmax(pred_reg[:, x_bin_l:x_bin_l + n_bin], axis=1)
        pz_bin = jax.nn.softmax(pred_reg[:, z_bin_l:z_bin_l + n_bin], axis=1)
        centers = jnp.arange(n_bin, dtype=dtype) * loc_bin_size + loc_bin_size / 2 - loc_scope
        px_abs = centers + pred_reg[:, start:start + n_bin] * loc_bin_size
        pz_abs = centers + pred_reg[:, start + n_bin:start + 2 * n_bin] * loc_bin_size
        pos_x = jnp.sum(px_abs * px_bin, axis=1)
        pos_z = jnp.sum(pz_abs * pz_bin, axis=1)
        start = start + 2 * n_bin

    # y
    if get_y_by_bin:
        y_bin = jnp.argmax(pred_reg[:, start:start + y_bin_num], axis=1)
        y_res_norm = jnp.take_along_axis(
            pred_reg[:, start + y_bin_num:start + 2 * y_bin_num], y_bin[:, None], axis=1)[:, 0]
        pos_y = (y_bin.astype(dtype) * loc_y_bin_size + loc_y_bin_size / 2 - loc_y_scope
                 + y_res_norm * loc_y_bin_size)
        pos_y = pos_y + roi_box3d[:, 1]
        start = start + 2 * y_bin_num
    else:
        pos_y = roi_box3d[:, 1] + pred_reg[:, start]
        start = start + 1

    # ry
    H = num_head_bin
    ry_bin_logits = pred_reg[:, start:start + H]
    ry_res_norm_all = pred_reg[:, start + H:start + 2 * H]
    if not ry_with_bin:
        ry_bin = jnp.argmax(ry_bin_logits, axis=1)
        ry_res_norm = jnp.take_along_axis(ry_res_norm_all, ry_bin[:, None], axis=1)[:, 0]
        if get_ry_fine:
            angle_per_class = (PI / 2) / H
            ry = (ry_bin.astype(dtype) * angle_per_class + angle_per_class / 2) \
                 + ry_res_norm * (angle_per_class / 2) - PI / 4
        else:
            angle_per_class = (2 * PI) / H
            ry = (ry_bin.astype(dtype) * angle_per_class + ry_res_norm * (angle_per_class / 2)) % (2 * PI)
            ry = jnp.where(ry > PI, ry - 2 * PI, ry)
    else:
        ry_bin_p = jax.nn.softmax(ry_bin_logits, axis=1)
        bin_ind = jnp.arange(H, dtype=dtype)
        if get_ry_fine:
            angle_per_class = (PI / 2) / H
            ry_all = (bin_ind * angle_per_class + angle_per_class / 2) \
                     + ry_res_norm_all * (angle_per_class / 2) - PI / 4  # (N, H)
            right = ry_all >= 0
        else:
            angle_per_class = (2 * PI) / H
            ry_all = (bin_ind * angle_per_class + ry_res_norm_all * (angle_per_class / 2)) % (2 * PI)
            right = ry_all <= PI
        pr = jnp.where(right, ry_bin_p, 0.0)
        pl = jnp.where(right, 0.0, ry_bin_p)
        p_r = jnp.sum(pr, axis=1, keepdims=True) + 1e-7
        p_l = jnp.sum(pl, axis=1, keepdims=True) + 1e-7
        ry_r = jnp.sum(jnp.where(right, ry_all, 0.0) * pr / p_r, axis=1)
        ry_l = jnp.sum(jnp.where(right, 0.0, ry_all) * pl / p_l, axis=1)
        use_r = (p_r[:, 0] >= p_l[:, 0])
        ry = jnp.where(use_r, ry_r, ry_l)
        if not get_ry_fine:
            ry = jnp.where(ry > PI, ry - 2 * PI, ry)
    start = start + 2 * H

    # size
    size_res_norm = pred_reg[:, start:start + 3]
    hwl = size_res_norm * anchor_size + anchor_size

    shifted = jnp.concatenate(
        [pos_x[:, None], pos_y[:, None], pos_z[:, None], hwl, ry[:, None]], axis=1)

    if roi_box3d.shape[1] == 7:
        roi_ry = roi_box3d[:, 6]
        # rotate back into the global frame then restore the roi heading
        rotated = rotate_points_along_y(shifted[:, None, :], -roi_ry)[:, 0, :]
        shifted = rotated.at[:, 6].add(roi_ry)
    return shifted.at[:, 0].add(roi_box3d[:, 0]).at[:, 2].add(roi_box3d[:, 2])
