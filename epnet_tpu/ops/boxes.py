"""3D box geometry in JAX — rect-camera coordinates, KITTI conventions.

Boxes are ``(..., 7) = [x, y, z, h, w, l, ry]`` with ``(x, y, z)`` the center
of the box *bottom* face, ``y`` pointing down, and ``ry`` the rotation around
the camera y axis. Matches the reference's numpy/torch helpers in
``/root/reference/lib/utils/kitti_utils.py`` (corners: :66-103, BEV: :137-150,
enlarge: :153-163) but everything here is batched, jittable jnp.
"""

from __future__ import annotations

import jax.numpy as jnp


def rotate_points_along_y(pts: jnp.ndarray, angle: jnp.ndarray) -> jnp.ndarray:
    """Rotate points around the camera y axis.

    :param pts: (..., P, 3+C) — only x (col 0) and z (col 2) are rotated.
    :param angle: (...) radians, broadcast over P.

    Matches ``rotate_pc_along_y_torch`` (kitti_utils.py:45-63): the 2D rotation
    is applied as ``[x z] @ R^T`` with ``R = [[c, -s], [s, c]]``.
    """
    c, s = jnp.cos(angle), jnp.sin(angle)
    x, z = pts[..., 0], pts[..., 2]
    c = c[..., None] if c.ndim == x.ndim - 1 else c
    s = s[..., None] if s.ndim == x.ndim - 1 else s
    nx = c * x - s * z
    nz = s * x + c * z
    return jnp.concatenate([nx[..., None], pts[..., 1:2], nz[..., None], pts[..., 3:]], axis=-1)


def boxes3d_to_corners3d(boxes3d: jnp.ndarray) -> jnp.ndarray:
    """(..., 7) -> (..., 8, 3) corners. First 4 corners are the bottom face
    (y = center y), last 4 the top face (y = center y - h). Corner order
    matches kitti_utils.py:66-103."""
    h, w, l = boxes3d[..., 3], boxes3d[..., 4], boxes3d[..., 5]
    half_l, half_w = l / 2.0, w / 2.0
    sign_x = jnp.asarray([1, 1, -1, -1, 1, 1, -1, -1], boxes3d.dtype)
    sign_z = jnp.asarray([1, -1, -1, 1, 1, -1, -1, 1], boxes3d.dtype)
    top = jnp.asarray([0, 0, 0, 0, 1, 1, 1, 1], boxes3d.dtype)
    x_c = half_l[..., None] * sign_x
    z_c = half_w[..., None] * sign_z
    y_c = -h[..., None] * top
    ry = boxes3d[..., 6:7]
    c, s = jnp.cos(ry), jnp.sin(ry)
    # same rotation as the numpy reference: [x y z] @ [[c,0,-s],[0,1,0],[s,0,c]]
    xr = c * x_c + s * z_c
    zr = -s * x_c + c * z_c
    corners = jnp.stack([xr, y_c, zr], axis=-1)
    return corners + boxes3d[..., None, 0:3]


def boxes3d_to_bev(boxes3d: jnp.ndarray) -> jnp.ndarray:
    """(..., 7) -> (..., 5) [x1, z1, x2, z2, ry] axis-span BEV box.

    Mirrors ``boxes3d_to_bev_torch`` (kitti_utils.py:137-150): the l/w extents
    are laid out along x/z *before* rotation, so for 'normal' NMS this is the
    unrotated footprint, exactly like the reference feeds ``nms_normal_gpu``.
    """
    cu, cv = boxes3d[..., 0], boxes3d[..., 2]
    half_l, half_w = boxes3d[..., 5] / 2.0, boxes3d[..., 4] / 2.0
    return jnp.stack([cu - half_l, cv - half_w, cu + half_l, cv + half_w, boxes3d[..., 6]], axis=-1)


def enlarge_box3d(boxes3d: jnp.ndarray, extra_width: float) -> jnp.ndarray:
    """Grow h/w/l by 2*extra_width and shift the bottom down by extra_width
    (kitti_utils.py:153-163)."""
    return jnp.concatenate(
        [
            boxes3d[..., 0:1],
            boxes3d[..., 1:2] + extra_width,
            boxes3d[..., 2:3],
            boxes3d[..., 3:6] + 2.0 * extra_width,
            boxes3d[..., 6:],
        ],
        axis=-1,
    )


def points_in_boxes3d(pts: jnp.ndarray, boxes3d: jnp.ndarray, max_dis: float = 10.0) -> jnp.ndarray:
    """Analytic rotated-box membership test.

    :param pts: (..., N, 3)
    :param boxes3d: (..., M, 7)
    :return: (..., M, N) bool

    Same test as the CUDA ``pt_in_box3d`` (roipool3d_kernel.cu:14-28): reject
    when |y - cy + h/2| > h/2 or horizontal distance > max_dis, then rotate the
    point into the box frame and compare |x| < l/2, |z| < w/2.
    """
    cx, cy, cz = boxes3d[..., 0], boxes3d[..., 1], boxes3d[..., 2]
    h, w, l, ry = boxes3d[..., 3], boxes3d[..., 4], boxes3d[..., 5], boxes3d[..., 6]
    px = pts[..., None, :, 0] - cx[..., None]  # (..., M, N)
    py = pts[..., None, :, 1] - cy[..., None]
    pz = pts[..., None, :, 2] - cz[..., None]
    h_ = h[..., None]
    in_y = jnp.abs(py + h_ / 2.0) <= h_ / 2.0
    near = (jnp.abs(px) < max_dis) & (jnp.abs(pz) < max_dis)
    c, s = jnp.cos(ry)[..., None], jnp.sin(ry)[..., None]
    x_rot = px * c - pz * s
    z_rot = px * s + pz * c
    in_xz = (jnp.abs(x_rot) <= l[..., None] / 2.0) & (jnp.abs(z_rot) <= w[..., None] / 2.0)
    return in_y & near & in_xz
