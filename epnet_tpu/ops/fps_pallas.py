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


_SUB = 8  # output is staged as (8, P) in VMEM to satisfy tiling rules


def _fps_kernel(xs_ref, ys_ref, zs_ref, out_ref, mind_ref, idx_ref, *, npoint: int, n: int):
    from jax.experimental import pallas as pl

    rows = n // _LANE
    flat_iota = (
        lax.broadcasted_iota(jnp.int32, (rows, _LANE), 0) * _LANE
        + lax.broadcasted_iota(jnp.int32, (rows, _LANE), 1)
    )
    lane_iota = lax.broadcasted_iota(jnp.int32, (1, _LANE), 1)

    mind_ref[:] = jnp.full((rows, _LANE), 1e10, dtype=jnp.float32)
    idx_ref[:] = jnp.zeros_like(idx_ref)
    P = idx_ref.shape[1]
    # sample j lives at (j % 8, j // 8): the lane axis advances fastest
    out_slot = (
        lax.broadcasted_iota(jnp.int32, (_SUB, P), 0)
        + lax.broadcasted_iota(jnp.int32, (_SUB, P), 1) * _SUB
    )

    def body(j, last):
        # scalar VMEM loads are unsupported; fetch the selected point's
        # coordinates via a dynamic row slice + a 128-lane masked reduce
        # (much cheaper than full-array masked reductions)
        r, c = last // _LANE, last % _LANE
        lane_m = lane_iota == c
        x1 = jnp.max(jnp.where(lane_m, xs_ref[0, pl.ds(r, 1), :], -jnp.inf))
        y1 = jnp.max(jnp.where(lane_m, ys_ref[0, pl.ds(r, 1), :], -jnp.inf))
        z1 = jnp.max(jnp.where(lane_m, zs_ref[0, pl.ds(r, 1), :], -jnp.inf))
        d = ((xs_ref[0] - x1) ** 2 + (ys_ref[0] - y1) ** 2 + (zs_ref[0] - z1) ** 2)
        mind = jnp.minimum(mind_ref[:], d)
        mind_ref[:] = mind
        best_val = jnp.max(mind)
        best = jnp.min(jnp.where(mind == best_val, flat_iota, n))
        idx_ref[:] = jnp.where(out_slot == j, best, idx_ref[:])
        return best

    lax.fori_loop(1, npoint, body, 0)
    out_ref[0] = idx_ref[:]


@functools.partial(jax.jit, static_argnums=(1,))
def furthest_point_sample_pallas(xyz: jnp.ndarray, npoint: int) -> jnp.ndarray:
    """(B, N, 3) -> (B, npoint) int32; N must be a multiple of 128."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, N, _ = xyz.shape
    assert N % _LANE == 0, f'FPS kernel needs N % {_LANE} == 0, got {N}'
    rows = N // _LANE
    P = max(_LANE, ((npoint + _SUB - 1) // _SUB + _LANE - 1) // _LANE * _LANE)
    xyz = lax.stop_gradient(xyz).astype(jnp.float32)
    planes = xyz.transpose(2, 0, 1).reshape(3, B, rows, _LANE)
    xs, ys, zs = planes[0], planes[1], planes[2]

    kernel = functools.partial(_fps_kernel, npoint=npoint, n=N)
    coord_spec = pl.BlockSpec((1, rows, _LANE), lambda b: (b, 0, 0), memory_space=pltpu.VMEM)

    staged = pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[coord_spec, coord_spec, coord_spec],
        out_specs=pl.BlockSpec((1, _SUB, P), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, _SUB, P), jnp.int32),
        scratch_shapes=[pltpu.VMEM((rows, _LANE), jnp.float32),
                        pltpu.VMEM((_SUB, P), jnp.int32)],
    )(xs, ys, zs)
    # invert the (j % 8, j // 8) staging layout
    return staged.transpose(0, 2, 1).reshape(B, P * _SUB)[:, :npoint]
