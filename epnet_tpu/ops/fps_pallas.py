"""Furthest point sampling as a Pallas TPU kernel.

The CUDA reference (sampling_gpu.cu:93-253) keeps a running min-distance
array in global memory and does a shared-memory tree argmax per selected
point. Here the whole per-batch state — point coordinates and the running
min-distance — lives in VMEM for the entire selection loop, so the
npoint-step sequential scan never touches HBM (N=16384 points is 256 KB of
state: far below the ~16 MB VMEM budget).

Layout: coordinates are pre-split into x/y/z planes of shape (R, 128)
(R = N/128) so every step is one fused VPU pass: distance update, running
min, and a flat argmax done as max + first-match-index reduction.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

_LANE = 128


def available() -> bool:
    try:
        return jax.default_backend() == 'tpu'
    except Exception:  # pragma: no cover
        return False


def _fps_kernel(xs_ref, ys_ref, zs_ref, out_ref, mind_ref, *, npoint: int, n: int):
    rows = n // _LANE
    flat_iota = (
        lax.broadcasted_iota(jnp.int32, (rows, _LANE), 0) * _LANE
        + lax.broadcasted_iota(jnp.int32, (rows, _LANE), 1)
    )

    mind_ref[:] = jnp.full((rows, _LANE), 1e10, dtype=jnp.float32)
    out_ref[0, 0] = 0

    def body(j, last):
        r, c = last // _LANE, last % _LANE
        x1, y1, z1 = xs_ref[0, r, c], ys_ref[0, r, c], zs_ref[0, r, c]
        d = ((xs_ref[0] - x1) ** 2 + (ys_ref[0] - y1) ** 2 + (zs_ref[0] - z1) ** 2)
        mind = jnp.minimum(mind_ref[:], d)
        mind_ref[:] = mind
        best_val = jnp.max(mind)
        best = jnp.min(jnp.where(mind == best_val, flat_iota, n))
        out_ref[0, j] = best
        return best

    lax.fori_loop(1, npoint, body, 0)


@functools.partial(jax.jit, static_argnums=(1,))
def furthest_point_sample_pallas(xyz: jnp.ndarray, npoint: int) -> jnp.ndarray:
    """(B, N, 3) -> (B, npoint) int32; N must be a multiple of 128."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, N, _ = xyz.shape
    assert N % _LANE == 0, f'FPS kernel needs N % {_LANE} == 0, got {N}'
    rows = N // _LANE
    xyz = lax.stop_gradient(xyz).astype(jnp.float32)
    planes = xyz.transpose(2, 0, 1).reshape(3, B, rows, _LANE)
    xs, ys, zs = planes[0], planes[1], planes[2]

    kernel = functools.partial(_fps_kernel, npoint=npoint, n=N)
    coord_spec = pl.BlockSpec((1, rows, _LANE), lambda b: (b, 0, 0), memory_space=pltpu.VMEM)

    return pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[coord_spec, coord_spec, coord_spec],
        out_specs=pl.BlockSpec((1, npoint), lambda b: (b, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, npoint), jnp.int32),
        scratch_shapes=[pltpu.VMEM((rows, _LANE), jnp.float32)],
    )(xs, ys, zs)
