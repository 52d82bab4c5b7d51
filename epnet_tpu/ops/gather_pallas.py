"""Batched small-table gather as an on-the-fly one-hot matmul Pallas kernel.

TPU row gathers are latency-bound (~13 ns/row regardless of width), so the
neighbourhood gathers of PointNet++ set abstraction (6.5M rows at the RCNN
stage, reference CUDA: group_points_gpu.cu:8-86) dominate the eval step if
expressed as gathers. When the source table fits VMEM (N <= ~2048 rows),
the gather is an MXU matmul with a 0/1 one-hot matrix instead — but
materializing the (K, N) one-hot in HBM costs more than it saves (XLA can't
fuse the iota-compare into the matmul operand). This kernel builds each
one-hot tile *inside* VMEM (an iota-compare against the index tile, no HBM
round trip) and feeds the MXU directly.

Exactness: a one-hot matmul reproduces table rows bit-exactly when the
product 1.0 * v and the single-nonzero accumulation are exact — true for
bf16 tables at native MXU precision and for f32 tables with
``Precision.HIGHEST`` (the f32 passthrough used by the XLA fast path in
``pointops.group_points``; verified on hardware by tools/verify_tpu_ops.py).

The backward pass (scatter-add of output grads into table rows,
group_points_gpu.cu backward) is the transposed one-hot matmul, accumulated
across index tiles in VMEM — same trick, no XLA scatter.
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


def _fwd_kernel(tbl_ref, idx_ref, out_ref, *, precision):
    n = tbl_ref.shape[1]
    kt = idx_ref.shape[1]
    # ohT[n, k] = (idx[k] == n): the (1, KT) index row broadcasts over
    # sublanes against a sublane iota — no transpose/relayout needed.
    ohT = (lax.broadcasted_iota(jnp.int32, (n, kt), 0) == idx_ref[:]).astype(
        tbl_ref.dtype)
    out = lax.dot_general(ohT, tbl_ref[0], (((0,), (0,)), ((), ())),
                          precision=precision,
                          preferred_element_type=jnp.float32)
    out_ref[0] = out.astype(out_ref.dtype)


def _bwd_kernel(idx_ref, g_ref, dtbl_ref, *, precision):
    from jax.experimental import pallas as pl

    n = dtbl_ref.shape[1]
    kt = idx_ref.shape[1]

    @pl.when(pl.program_id(1) == 0)
    def _init():
        dtbl_ref[0] = jnp.zeros_like(dtbl_ref[0])

    ohT = (lax.broadcasted_iota(jnp.int32, (n, kt), 0) == idx_ref[:]).astype(
        g_ref.dtype)
    dtbl_ref[0] += lax.dot_general(
        ohT, g_ref[0], (((1,), (1,)), ((), ())), precision=precision,
        preferred_element_type=jnp.float32).astype(dtbl_ref.dtype)


def _tile(k: int) -> int:
    for kt in (2048, 1024, 512, 256, _LANE):
        if k % kt == 0:
            return kt
    return 0


def _precision(dtype) -> lax.Precision:
    return (lax.Precision.HIGHEST if dtype == jnp.float32
            else lax.Precision.DEFAULT)


def supported(n: int, k: int, dtype) -> bool:
    """Table must fit VMEM alongside the tiles; K must tile cleanly."""
    return (available() and n <= 2048 and _tile(k) > 0
            and dtype in (jnp.float32, jnp.bfloat16))


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def onehot_gather(table: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """table (T, N, C), idx (T, K) int32 -> (T, K, C) == table[t, idx[t]]."""
    return _fwd(table, idx)


def _fwd(table, idx):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    T, N, C = table.shape
    K = idx.shape[1]
    kt = _tile(K)
    grid = (T, K // kt)
    return pl.pallas_call(
        functools.partial(_fwd_kernel, precision=_precision(table.dtype)),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, N, C), lambda t, k: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, kt), lambda t, k: (t, k),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, kt, C), lambda t, k: (t, k, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((T, K, C), table.dtype),
    )(table, idx)


def _fwd_vjp(table, idx):
    return _fwd(table, idx), (idx, table.shape, table.dtype)


def _bwd_vjp(res, g):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    idx, tshape, tdtype = res
    T, N, C = tshape
    K = idx.shape[1]
    kt = _tile(K)
    grid = (T, K // kt)
    g = g.astype(tdtype)
    dtable = pl.pallas_call(
        functools.partial(_bwd_kernel, precision=_precision(tdtype)),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, kt), lambda t, k: (t, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, kt, C), lambda t, k: (t, k, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, N, C), lambda t, k: (t, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((T, N, C), tdtype),
    )(idx, g)
    return dtable, None


onehot_gather.defvjp(_fwd_vjp, _bwd_vjp)
