"""Bilinear feature sampling at continuous image locations.

Replaces ``torch.nn.functional.grid_sample`` as used by LI-Fusion's
``Feature_Gather`` (``/root/reference/lib/net/pointnet2_msg.py:107-120``).
The reference normalizes pixel coords to [-1, 1] against ``size - 1``
(pointnet2_msg.py:207-210), i.e. align_corners=True semantics: grid -1 maps
to pixel 0 and +1 to pixel W-1. The reference pins ``torch===1.2.0``
(requirements.txt), which predates the align_corners flag (added in torch
1.3 with a False default) and always used align_corners=True behaviour —
so this mapping matches the runtime that produced the published results.
Out-of-bounds taps contribute zero (padding_mode='zeros').

TPU-first: the gather of 4 neighbouring texels per point is a
``take_along_axis`` over the flattened H*W axis — XLA lowers this to a
dynamic-gather that autodiffs into scatter-adds, so no custom backward is
needed (the reference relied on torch's CUDA grid_sampler kernels).
"""

from __future__ import annotations

import jax.numpy as jnp


def grid_sample_points(feature_map: jnp.ndarray, xy_norm: jnp.ndarray) -> jnp.ndarray:
    """
    :param feature_map: (B, H, W, C)  (channels-last for TPU)
    :param xy_norm: (B, N, 2) in [-1, 1], (x, y) order like torch grid_sample
    :return: (B, N, C)
    """
    B, H, W, C = feature_map.shape
    x = (xy_norm[..., 0] + 1.0) * 0.5 * (W - 1)
    y = (xy_norm[..., 1] + 1.0) * 0.5 * (H - 1)

    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    dx = x - x0
    dy = y - y0

    flat = feature_map.reshape(B, H * W, C)

    def tap(xi, yi, w):
        inside = (xi >= 0) & (xi <= W - 1) & (yi >= 0) & (yi <= H - 1)
        xc = jnp.clip(xi, 0, W - 1).astype(jnp.int32)
        yc = jnp.clip(yi, 0, H - 1).astype(jnp.int32)
        vals = jnp.take_along_axis(flat, (yc * W + xc)[..., None], axis=1)  # (B, N, C)
        return vals * (w * inside.astype(vals.dtype))[..., None]

    out = (
        tap(x0, y0, (1 - dx) * (1 - dy))
        + tap(x0 + 1, y0, dx * (1 - dy))
        + tap(x0, y0 + 1, (1 - dx) * dy)
        + tap(x0 + 1, y0 + 1, dx * dy)
    )
    return out
