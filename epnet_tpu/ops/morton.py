"""Morton (Z-order) codes for spatial point-cloud sorting.

Block-local neighbourhood grouping (``ops/block_local.py``) requires the
cloud in a spatially-coherent order so that a centroid's in-radius
neighbours sit inside a small contiguous window of the array. The loader
sorts each cloud by 2-D Morton code over the ground plane (KITTI rect
x = lateral, z = depth; the vertical y span is ~4 m — small against the
grouping radii — so interleaving it would only waste code bits).

The reference has no analogue: its CUDA ball query scans all N points per
centroid (ball_query_gpu.cu:9-67). On TPU that scan is a 134M-element
distance field plus a ~1M-row gather per batch; Morton sorting is what
converts both into dense block-local work.

Host (numpy) and device (jnp) implementations share the same bit tricks;
the loader uses the numpy path so device steps see pre-sorted clouds.
"""

from __future__ import annotations

import numpy as np

BITS = 16  # per-axis quantization bits; 2 axes * 16 = 32-bit codes


def _part1by1(x):
    """Spread the low 16 bits of x to even bit positions (u32 in, u32 out).

    Works elementwise for numpy and jax arrays alike.
    """
    x = x & 0xFFFF
    x = (x | (x << 8)) & 0x00FF00FF
    x = (x | (x << 4)) & 0x0F0F0F0F
    x = (x | (x << 2)) & 0x33333333
    x = (x | (x << 1)) & 0x55555555
    return x


def _quantize(v, lo, hi, xp):
    span = xp.maximum(hi - lo, 1e-6)
    q = (v - lo) / span * float(2 ** BITS - 1)
    return xp.clip(q, 0, 2 ** BITS - 1)


def morton_code_np(xyz: np.ndarray) -> np.ndarray:
    """(..., N, 3) -> (..., N) uint32 2-D Morton codes over (x, z).

    Quantization range is the per-cloud min/max (robust to augmentation
    shifts; only relative order matters).
    """
    x, z = xyz[..., 0], xyz[..., 2]
    qx = _quantize(x, x.min(axis=-1, keepdims=True),
                   x.max(axis=-1, keepdims=True), np).astype(np.uint32)
    qz = _quantize(z, z.min(axis=-1, keepdims=True),
                   z.max(axis=-1, keepdims=True), np).astype(np.uint32)
    return _part1by1(qx) | (_part1by1(qz) << np.uint32(1))


def morton_argsort_np(xyz: np.ndarray) -> np.ndarray:
    """(N, 3) -> (N,) permutation putting the cloud in Morton order."""
    return np.argsort(morton_code_np(xyz), kind='stable').astype(np.int64)


def morton_code_jnp(xyz):
    """Device-side twin of :func:`morton_code_np`; (B, N, 3) -> (B, N) u32."""
    import jax.numpy as jnp

    x, z = xyz[..., 0], xyz[..., 2]
    qx = _quantize(x, jnp.min(x, axis=-1, keepdims=True),
                   jnp.max(x, axis=-1, keepdims=True), jnp).astype(jnp.uint32)
    qz = _quantize(z, jnp.min(z, axis=-1, keepdims=True),
                   jnp.max(z, axis=-1, keepdims=True), jnp).astype(jnp.uint32)
    return _part1by1(qx) | (_part1by1(qz) << jnp.uint32(1))
