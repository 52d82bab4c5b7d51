"""Furthest point sampling as a Pallas TPU kernel.

The CUDA reference (sampling_gpu.cu:93-253) keeps a running min-distance
array in global memory and does a shared-memory tree argmax per selected
point. Here the whole per-program state — point coordinates and the running
min-distance — lives in VMEM for the entire selection loop (N=16384 points
is 256 KB of state per batch element: far below the ~16 MB VMEM budget).

Performance notes (v5e):
  * each selection step is latency-bound on a chain of VPU reductions; the
    selected point's coordinates are fetched with a dynamic ROW slice plus a
    128-lane masked reduce (cheap) instead of full-array masked reductions;
  * a few batch elements are interleaved per grid step ("pair"): their
    independent reduction chains overlap in the issue pipeline (~13% gain);
  * scalar VMEM loads/stores are unsupported by Mosaic — everything scalar
    goes through masked select/reduce;
  * the output is staged as (8, P) to satisfy the (8, 128) tiling rules:
    sample j lives at (j % 8, j // 8).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

_LANE = 128
_SUB = 8


def available() -> bool:
    try:
        return jax.default_backend() == 'tpu'
    except Exception:  # pragma: no cover
        return False


def _fps_kernel_vec(xs_ref, ys_ref, zs_ref, out_ref, mind_ref, *,
                    npoint: int, n: int, pair: int):
    """Pair-VECTORIZED selection step over a 2D (pair, N) layout: one batched
    lane-reduction chain instead of ``pair`` unrolled scalar chains.

    The unrolled kernel's per-step cost is pair x (fixed chain latency); at
    large ``pair`` with small sub-clouds (partitioned FPS: 64 x 2048) that
    dominates. Here each sub-cloud owns one sublane row, per-pair scalars
    are (pair, 1) lane reductions (keepdims), and every step is ~6 VPU
    passes over the whole block regardless of pair — the dispatch crossover
    vs the unrolled kernel is measured in tools/profile_fps_partitioned.py.
    """
    iota_n = lax.broadcasted_iota(jnp.int32, (pair, n), 1)
    P = out_ref.shape[1]
    slot = lax.broadcasted_iota(jnp.int32, (pair, P), 1)

    mind_ref[:] = jnp.full((pair, n), 1e10, dtype=jnp.float32)
    out_ref[:] = jnp.zeros_like(out_ref)

    def body(j, last):
        eq = iota_n == last
        x1 = jnp.max(jnp.where(eq, xs_ref[:], -jnp.inf), axis=1,
                     keepdims=True)
        y1 = jnp.max(jnp.where(eq, ys_ref[:], -jnp.inf), axis=1,
                     keepdims=True)
        z1 = jnp.max(jnp.where(eq, zs_ref[:], -jnp.inf), axis=1,
                     keepdims=True)
        d = ((xs_ref[:] - x1) ** 2 + (ys_ref[:] - y1) ** 2
             + (zs_ref[:] - z1) ** 2)
        mind = jnp.minimum(mind_ref[:], d)
        mind_ref[:] = mind
        best_val = jnp.max(mind, axis=1, keepdims=True)
        best = jnp.min(jnp.where(mind == best_val, iota_n, n), axis=1,
                       keepdims=True)
        out_ref[:] = jnp.where(slot == j, best, out_ref[:])
        return best

    lax.fori_loop(1, npoint, body, jnp.zeros((pair, 1), jnp.int32))


def _fps_kernel(xs_ref, ys_ref, zs_ref, out_ref, mind_ref, idx_ref, *,
                npoint: int, n: int, pair: int):
    from jax.experimental import pallas as pl

    rows = n // _LANE
    flat_iota = (
        lax.broadcasted_iota(jnp.int32, (rows, _LANE), 0) * _LANE
        + lax.broadcasted_iota(jnp.int32, (rows, _LANE), 1)
    )
    lane_iota = lax.broadcasted_iota(jnp.int32, (1, _LANE), 1)

    mind_ref[:] = jnp.full((pair, rows, _LANE), 1e10, dtype=jnp.float32)
    idx_ref[:] = jnp.zeros_like(idx_ref)
    P = idx_ref.shape[2]
    out_slot = (
        lax.broadcasted_iota(jnp.int32, (_SUB, P), 0)
        + lax.broadcasted_iota(jnp.int32, (_SUB, P), 1) * _SUB
    )

    def body(j, lasts):
        new = []
        for p in range(pair):
            last = lasts[p]
            r, c = last // _LANE, last % _LANE
            lane_m = lane_iota == c
            x1 = jnp.max(jnp.where(lane_m, xs_ref[p, pl.ds(r, 1), :], -jnp.inf))
            y1 = jnp.max(jnp.where(lane_m, ys_ref[p, pl.ds(r, 1), :], -jnp.inf))
            z1 = jnp.max(jnp.where(lane_m, zs_ref[p, pl.ds(r, 1), :], -jnp.inf))
            d = ((xs_ref[p] - x1) ** 2 + (ys_ref[p] - y1) ** 2 + (zs_ref[p] - z1) ** 2)
            mind = jnp.minimum(mind_ref[p], d)
            mind_ref[p] = mind
            best_val = jnp.max(mind)
            best = jnp.min(jnp.where(mind == best_val, flat_iota, n))
            idx_ref[p] = jnp.where(out_slot == j, best, idx_ref[p])
            new.append(best)
        return tuple(new)

    lax.fori_loop(1, npoint, body, tuple(jnp.int32(0) for _ in range(pair)))
    out_ref[:] = idx_ref[:]


@functools.partial(jax.jit, static_argnums=(1, 2, 3))
def furthest_point_sample_pallas(xyz: jnp.ndarray, npoint: int,
                                 pair: int = 0,
                                 vectorized: bool = False) -> jnp.ndarray:
    """(B, N, 3) -> (B, npoint) int32; N must be a multiple of 128.

    ``pair`` = batch elements interleaved per grid step (0 = auto); their
    independent reduction chains overlap in the VPU issue pipeline.
    ``vectorized`` batches the per-step reductions across the pair axis
    instead (wins at large pair / small N — see _fps_kernel_vec).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, N, _ = xyz.shape
    assert N % _LANE == 0, f'FPS kernel needs N % {_LANE} == 0, got {N}'
    rows = N // _LANE
    P = max(_LANE, ((npoint + _SUB - 1) // _SUB + _LANE - 1) // _LANE * _LANE)
    pair = pair or next(p for p in (8, 4, 2, 1) if B % p == 0)
    xyz = lax.stop_gradient(xyz).astype(jnp.float32)

    if vectorized:
        P2 = (npoint + _LANE - 1) // _LANE * _LANE
        planes2 = xyz.transpose(2, 0, 1)  # (3, B, N)
        kernel = functools.partial(_fps_kernel_vec, npoint=npoint, n=N,
                                   pair=pair)
        cspec = pl.BlockSpec((pair, N), lambda b: (b, 0),
                             memory_space=pltpu.VMEM)
        out = pl.pallas_call(
            kernel,
            grid=(B // pair,),
            in_specs=[cspec, cspec, cspec],
            out_specs=pl.BlockSpec((pair, P2), lambda b: (b, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, P2), jnp.int32),
            scratch_shapes=[pltpu.VMEM((pair, N), jnp.float32)],
        )(planes2[0], planes2[1], planes2[2])
        return out[:, :npoint]

    planes = xyz.transpose(2, 0, 1).reshape(3, B, rows, _LANE)

    kernel = functools.partial(_fps_kernel, npoint=npoint, n=N, pair=pair)
    coord_spec = pl.BlockSpec((pair, rows, _LANE), lambda b: (b, 0, 0),
                              memory_space=pltpu.VMEM)

    staged = pl.pallas_call(
        kernel,
        grid=(B // pair,),
        in_specs=[coord_spec, coord_spec, coord_spec],
        out_specs=pl.BlockSpec((pair, _SUB, P), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, _SUB, P), jnp.int32),
        scratch_shapes=[pltpu.VMEM((pair, rows, _LANE), jnp.float32),
                        pltpu.VMEM((pair, _SUB, P), jnp.int32)],
    )(planes[0], planes[1], planes[2])
    # invert the (j % 8, j // 8) staging layout
    return staged.transpose(0, 2, 1).reshape(B, P * _SUB)[:, :npoint]
