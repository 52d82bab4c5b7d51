"""Fused deconv-pyramid + BatchNorm + ReLU + bilinear point sampling.

Replaces the training-path composition [DeconvFusionHead -> BN -> relu ->
grid_sample] (reference: ``lib/net/pointnet2_msg.py:239-246`` building the
full-resolution image fusion map that ``Feature_Gather`` then samples).
The reference materializes the (H, W, F) map and relies on CUDA
grid_sampler/atomicAdd for the backward; on TPU the autodiff backward of
that composition costs ~73 ms/B4 — a 33 ms XLA row-scatter into the
491520-row full-res map (measured update-size-independent,
tools/profile_gs_bwd.py) plus repeated full-resolution HBM passes.

TPU-first design — nothing full-resolution ever exists:

* The whole pipeline runs in a **half-resolution layout**
  ``ph[b, h2, w2, slot, f]`` with ``slot = (y%2)*2 + x%2``: the k=2 deconv
  scale is the identity in this layout, coarser scales (k = 4, 8, 16)
  regroup into it with pure reshape/transposes, and BN statistics reduce
  over it directly.
* Sampling gathers the 4 bilinear corner rows of each point; BN
  normalization + ReLU are applied to the *gathered corners only*.
* Backward: the 2x2 bilinear patch of any point covers each of the 4
  half-res slots **exactly once** (corner parities (y0+dy)%2 enumerate
  {0,1}^2), so the full-res scatter factorizes into 4 scatters of N
  updates each into the (H/2 * W/2)-row per-slot table — the size class
  XLA handles at ~1.5 ms instead of 33.
* The BN backward is closed-form: ``dpre = (g/s)(dpost - S1/M - xhat*S2/M)``
  has a sparse part (the sampled corners) and per-channel constants, so
  the dense correction is one fused elementwise pass over ``ph``.

Gradients match JAX autodiff of the dense composition (see
tests/test_deconv_sample.py). No gradient flows to xy (projected
coordinates are loader constants, pointnet2_msg.py:207-219); the
pre-BN deconv biases still receive their (mathematically ~zero) gradient
through the dense reduction for exactness.
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp


def _perm_cw(cw: jnp.ndarray, k: int, F: int) -> jnp.ndarray:
    """Permute a folded deconv weight's columns from (ky, kx, f) order to
    (u2, v2, sy, sx, f) with ky = 2*u2 + sy, kx = 2*v2 + sx.

    Round-5 lesson (tools/profile_head_eval.py decompose, on-chip): the
    cross-scale accumulation dominated the head — 31.8 of ~39 ms/B8 —
    because each scale's depth-to-space regroup is a transpose whose minor
    dimension is the narrow F=32, which TPU lowers as a lane-shuffling
    copy, and the 4-way add forces all of them to materialize. Reordering
    the WEIGHT columns instead makes every regroup a transpose that keeps
    a full (sy, sx, f) = 4F = 128-wide minor dimension intact (a cheap
    sublane-block move; the k=2 scale needs no transpose at all), so the
    adds fuse into one pass over the half-res layout."""
    C = cw.shape[0]
    m = k // 2
    w4 = cw.reshape(C, m, 2, m, 2, F)        # (C, u2, sy, v2, sx, F)
    return w4.transpose(0, 1, 3, 2, 4, 5).reshape(C, k * k * F)


def _regroup_to_half(y: jnp.ndarray, k: int, F: int) -> jnp.ndarray:
    """(B, h, w, k*k*F) matmul output with PERMUTED (_perm_cw) columns,
    re-expressed on the half-res grid: returns (B, h*k//2, w*k//2, 4, F)
    where axis 3 is the full-res 2x2 subpixel slot (sy, sx). The minor
    (4F) axis is untouched by the transpose — see _perm_cw."""
    B, h, w, _ = y.shape
    if k == 2:
        return y.reshape(B, h, w, 4, F)
    m = k // 2
    y = y.reshape(B, h, w, m, m, 4 * F)      # (B, Y, X, u2, v2, syxf)
    y = y.transpose(0, 1, 3, 2, 4, 5)        # minor dim stays (4F)
    return y.reshape(B, h * m, w * m, 4, F)


def _unperm_cw(cwp: jnp.ndarray, k: int, F: int) -> jnp.ndarray:
    """Inverse of _perm_cw: (u2, v2, sy, sx, f) columns -> (ky, kx, f)."""
    C = cwp.shape[0]
    m = k // 2
    w4 = cwp.reshape(C, m, m, 2, 2, F)       # (C, u2, v2, sy, sx, F)
    return w4.transpose(0, 1, 3, 2, 4, 5).reshape(C, k * k * F)


def _half_to_scale(dph: jnp.ndarray, k: int, h: int, w: int, F: int) -> jnp.ndarray:
    """Inverse of _regroup_to_half: (B, H2, W2, 4, F) -> (B, h, w, k*k*F)
    in the PERMUTED (u2, v2, sy, sx, f) column order — lane-preserving like
    the forward regroup (see _perm_cw)."""
    B = dph.shape[0]
    if k == 2:
        return dph.reshape(B, h, w, 4 * F)
    m = k // 2
    d = dph.reshape(B, h, m, w, m, 4 * F)    # (B, Y, u2, X, v2, syxf)
    d = d.transpose(0, 1, 3, 2, 4, 5)        # minor dim stays (4F)
    return d.reshape(B, h, w, k * k * F)


def _corner_data(xy_norm: jnp.ndarray, H: int, W: int):
    """Bilinear corner rows/weights in the half-res slot layout.

    Same pixel mapping as ops/grid_sample.py (align_corners=True, clipped
    2x2 window, hat weights self-zero out-of-window taps).
    Returns rows (B, N, 4) int32 into the (H2*W2*4)-row table,
    weights (B, N, 4) f32, and the corner offsets (dy, dx) per corner slot
    position for the backward's slot factorization: parity arrays
    y0&1, x0&1 (B, N) int32.
    """
    x = (xy_norm[..., 0] + 1.0) * 0.5 * (W - 1)
    y = (xy_norm[..., 1] + 1.0) * 0.5 * (H - 1)
    x0 = jnp.clip(jnp.floor(x), 0, max(W - 2, 0)).astype(jnp.int32)
    y0 = jnp.clip(jnp.floor(y), 0, max(H - 2, 0)).astype(jnp.int32)
    W2 = W // 2
    rows, wts = [], []
    for dy in range(2):
        for dx in range(2):
            py = y0 + dy
            px = x0 + dx
            wy = jnp.maximum(0.0, 1.0 - jnp.abs(y - py))
            wx = jnp.maximum(0.0, 1.0 - jnp.abs(x - px))
            cell = (py >> 1) * W2 + (px >> 1)
            slot = (py & 1) * 2 + (px & 1)
            rows.append(cell * 4 + slot)
            wts.append(wy * wx)
    return (jnp.stack(rows, -1), jnp.stack(wts, -1),
            y0 & 1, x0 & 1)


def _gather_rows(tbl: jnp.ndarray, rows: jnp.ndarray) -> jnp.ndarray:
    """tbl (B, R, F), rows (B, N, 4) -> (B, N, 4, F) batched row gather."""
    B, R, F = tbl.shape
    N = rows.shape[1]
    dnums = jax.lax.GatherDimensionNumbers(
        offset_dims=(2,),
        collapsed_slice_dims=(1,),
        start_index_map=(1,),
        operand_batching_dims=(0,),
        start_indices_batching_dims=(0,),
    )
    out = jax.lax.gather(
        tbl, rows.reshape(B, N * 4, 1), dnums, slice_sizes=(1, 1, F),
        mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS)
    return out.reshape(B, N, 4, F)


def _build_ph(xs, cws, bias_fused, ks, F):
    """Half-res pre-BN map: (B, H2, W2, 4, F), in the xs/cws dtype.

    Weights are column-permuted per scale (_perm_cw) so every regroup
    keeps the 4F minor dimension intact and the cross-scale adds fuse
    (31.8 -> ~3 ms/B8 on-chip; tools/profile_head_eval.py decompose)."""
    ph = None
    for x, cw, k in zip(xs, cws, ks):
        y = x @ _perm_cw(cw, k, F)  # (B, h, w, k*k*F), permuted columns
        r = _regroup_to_half(y, k, F)
        ph = r if ph is None else ph + r
    return ph + bias_fused.astype(ph.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7))
def deconv_bn_relu_sample(xs: Tuple[jnp.ndarray, ...],
                          cws: Tuple[jnp.ndarray, ...],
                          bias_fused: jnp.ndarray,
                          scale: jnp.ndarray,
                          bias: jnp.ndarray,
                          xy_norm: jnp.ndarray,
                          ks: Tuple[int, ...],
                          eps: float):
    """
    :param xs: per-scale image features, (B, H//k, W//k, C_k) each
    :param cws: folded deconv+reduction weights, (C_k, k*k*F) each
    :param bias_fused: (F,) pre-BN fused bias
    :param scale, bias: (F,) BatchNorm affine parameters (f32)
    :param xy_norm: (B, N, 2) in [-1, 1] (x, y), align_corners=True mapping
    :param ks: static per-scale upsampling factors (all even)
    :param eps: BN epsilon
    :return: (pts (B, N, F) in the xs dtype, batch_mean (F,) f32,
              unbiased batch_var (F,) f32)
    """
    out, _ = _fwd(xs, cws, bias_fused, scale, bias, xy_norm, ks, eps)
    return out


def _fwd(xs, cws, bias_fused, scale, bias, xy_norm, ks, eps):
    F = scale.shape[0]
    k0 = ks[0]
    H = xs[0].shape[1] * k0
    W = xs[0].shape[2] * k0
    B = xs[0].shape[0]
    H2, W2 = H // 2, W // 2

    ph = _build_ph(xs, cws, bias_fused, ks, F)      # (B, H2, W2, 4, F)
    in_dtype = ph.dtype

    red = (0, 1, 2, 3)
    mean = jnp.mean(ph, axis=red, dtype=jnp.float32)
    diff_full = ph - mean.astype(in_dtype)
    var = jnp.mean(jnp.square(diff_full.astype(jnp.float32)), axis=red)
    M = B * H2 * W2 * 4
    unbiased = var * (M / max(M - 1, 1))

    rows, wts, py0, px0 = _corner_data(xy_norm, H, W)
    ph_c = _gather_rows(ph.reshape(B, H2 * W2 * 4, F), rows)  # (B,N,4,F)

    w_fold = (jax.lax.rsqrt(var + eps) * scale).astype(in_dtype)  # (F,)
    diff_c = ph_c - mean.astype(in_dtype)
    post_c = diff_c * w_fold + bias.astype(in_dtype)
    z_c = jnp.maximum(post_c, 0)
    pts = jnp.einsum('bnc,bncf->bnf', wts.astype(in_dtype), z_c)

    res = (xs, cws, scale, bias, mean, var, ph, ph_c, rows, wts, py0, px0)
    return (pts, mean, unbiased), res


def _bwd(ks, eps, res, cts):
    g, _, _ = cts  # no cotangents flow through the returned statistics
    (xs, cws, scale, bias, mean, var, ph, ph_c, rows, wts, py0, px0) = res
    F = scale.shape[0]
    B, H2, W2, _, _ = ph.shape
    M = B * H2 * W2 * 4
    in_dtype = ph.dtype

    inv = jax.lax.rsqrt(var + eps)                    # (F,) f32
    gs = (scale * inv)                                # gamma/sigma (F,) f32

    # --- sampled-corner (sparse) terms ---------------------------------
    diff_c = (ph_c.astype(jnp.float32) - mean)        # (B,N,4,F)
    xhat_c = diff_c * inv
    post_c = xhat_c * scale + bias
    mask_c = (post_c > 0).astype(jnp.float32)
    gf = g.astype(jnp.float32)
    dpost_c = wts[..., None] * gf[:, :, None, :] * mask_c   # (B,N,4,F)

    S1 = jnp.sum(dpost_c, axis=(0, 1, 2))             # (F,)
    S2 = jnp.sum(dpost_c * xhat_c, axis=(0, 1, 2))    # (F,)
    dscale = S2
    dbias = S1

    v_c = dpost_c * gs                                # sparse dpre values

    # --- slot-factorized scatter into the half-res grid ----------------
    # corner (dy, dx) lands in slot (py0^dy? no: (y0+dy)&1 = py0 XOR dy).
    # For slot (sy, sx) the contributing corner of EVERY point is
    # (dy, dx) = (sy ^ py0, sx ^ px0) — exactly one corner per point.
    cell = rows >> 2                                  # (B, N, 4)

    def slot_updates(s):
        """(values, cells) of the one corner of every point landing in
        half-res subpixel slot s = sy*2 + sx."""
        sy, sx = s >> 1, s & 1
        c = (sy ^ py0) * 2 + (sx ^ px0)               # contributing corner
        sel = jax.nn.one_hot(c, 4, dtype=v_c.dtype)   # (B, N, 4)
        val = jnp.einsum('bnc,bncf->bnf', sel, v_c)
        cel = jnp.sum(sel.astype(jnp.int32) * cell, axis=-1)  # (B, N)
        return val, cel

    # Dual-packed scatter: two slots share one (R, 2F) table, each slot's
    # updates zero-padded into its column half (adding zeros into the
    # other half is harmless). 2 scatters of 2N updates measured 4.2 ms
    # vs 17.6 for 4 naive (R, F) scatters (tools/profile_slot_scatter.py —
    # XLA's TPU scatter lowering has sharp width/update-count cliffs).
    dph_sparse = []
    for s0 in (0, 2):
        vA, cA = slot_updates(s0)
        vB, cB = slot_updates(s0 + 1)
        z = jnp.zeros_like(vA)
        v = jnp.concatenate([jnp.concatenate([vA, z], -1),
                             jnp.concatenate([z, vB], -1)], 1)  # (B,2N,2F)
        c = jnp.concatenate([cA, cB], 1)
        tbl = jax.vmap(lambda ce, va: jnp.zeros(
            (H2 * W2, 2 * F), jnp.float32).at[ce].add(va))(c, v)
        dph_sparse.extend([tbl[..., :F], tbl[..., F:]])
    # (B, H2*W2, 4, F): slot axis ordered (sy, sx)
    dph = jnp.stack(dph_sparse, axis=2).reshape(B, H2, W2, 4, F)

    # --- dense closed-form BN correction -------------------------------
    A = (-gs * (S1 / M)).astype(jnp.float32)          # (F,)
    Bt = (-gs * (S2 / M))                             # (F,)
    xhat_half = (ph.astype(jnp.float32) - mean) * inv
    dph = (dph + A + Bt * xhat_half).astype(in_dtype)

    # --- per-scale unfold + matmuls ------------------------------------
    # dy comes out of _half_to_scale in the PERMUTED column order, so dx
    # pulls against the permuted weight and the weight grad lands permuted
    # and is unpermuted before returning (callers hold (ky, kx, f) order).
    dxs, dcws = [], []
    dbias_fused = jnp.sum(dph.astype(jnp.float32), axis=(0, 1, 2, 3))
    for x, cw, k in zip(xs, cws, ks):
        h, w = x.shape[1], x.shape[2]
        dy = _half_to_scale(dph, k, h, w, F)          # (B, h, w, k*k*F)
        dxs.append((dy @ _perm_cw(cw, k, F).T).astype(x.dtype))
        dcw = jnp.einsum('bhwc,bhwK->cK', x.astype(jnp.float32),
                         dy.astype(jnp.float32))
        dcws.append(_unperm_cw(dcw, k, F).astype(cw.dtype))

    # no gradient to xy (loader constants) — return explicit zeros
    dxy = jnp.zeros((rows.shape[0], rows.shape[1], 2), jnp.float32)

    return (tuple(dxs), tuple(dcws), dbias_fused.astype(jnp.float32),
            dscale, dbias, dxy)


deconv_bn_relu_sample.defvjp(_fwd, _bwd)


def deconv_bn_relu_sample_eval(xs: Tuple[jnp.ndarray, ...],
                               cws: Tuple[jnp.ndarray, ...],
                               bias_fused: jnp.ndarray,
                               scale: jnp.ndarray,
                               bias: jnp.ndarray,
                               mean: jnp.ndarray,
                               var: jnp.ndarray,
                               xy_norm: jnp.ndarray,
                               ks: Tuple[int, ...],
                               eps: float) -> jnp.ndarray:
    """EVAL-mode fused head: running-stat BN instead of batch stats, no
    backward. Same per-pixel arithmetic as the dense path (affine + ReLU
    commute with the gather), but the four full-resolution scale maps,
    their sum, and the normalized map never reach HBM — only the half-res
    accumulator ``ph`` and the N sampled corner rows do. Round-5 attack on
    the ~26 ms/B8 per-scan image stream the rotated protocol exposed
    (BASELINE.md "Protocol correction"; VERDICT r4 item 4).

    :param mean, var: the BatchNorm RUNNING statistics (f32, (F,)).
    Other params as in deconv_bn_relu_sample. Returns (B, N, F).
    """
    F = scale.shape[0]
    k0 = ks[0]
    H = xs[0].shape[1] * k0
    W = xs[0].shape[2] * k0
    B = xs[0].shape[0]
    H2, W2 = H // 2, W // 2

    ph = _build_ph(xs, cws, bias_fused, ks, F)      # (B, H2, W2, 4, F)
    in_dtype = ph.dtype

    # --- one PATCH gather per point instead of 4 row gathers -----------
    # TPU row gathers are issue-bound (~10 ns/row regardless of locality,
    # tools/profile_gather_locality.py), so the first cut of this op — 4
    # separate corner-row gathers — was 4x the issues of the dense path's
    # (2,2,C) patch trick and measured SLOWER end-to-end. A point's 2x2
    # full-res bilinear patch always lies inside the 2x2 half-res CELL
    # window anchored at (y0>>1, x0>>1): (y0+dy)>>1 ∈ {y0>>1, y0>>1 + 1}
    # with the +1 only when y0 is odd, same in x. So ONE (2, 2, 4F) patch
    # gather per point fetches all four corners (16F values, 4x overfetch
    # on a bandwidth-cold op), and per-corner (window-row, window-col,
    # slot) one-hots place the bilinear weights.
    x = (xy_norm[..., 0] + 1.0) * 0.5 * (W - 1)
    y = (xy_norm[..., 1] + 1.0) * 0.5 * (H - 1)
    x0 = jnp.clip(jnp.floor(x), 0, max(W - 2, 0)).astype(jnp.int32)
    y0 = jnp.clip(jnp.floor(y), 0, max(H - 2, 0)).astype(jnp.int32)
    cys = jnp.clip(y0 >> 1, 0, max(H2 - 2, 0))      # window anchor
    cxs = jnp.clip(x0 >> 1, 0, max(W2 - 2, 0))

    wt = jnp.zeros((B, xy_norm.shape[1], 2, 2, 4), jnp.float32)
    for dy in range(2):
        for dx in range(2):
            py = y0 + dy
            px = x0 + dx
            wy = jnp.maximum(0.0, 1.0 - jnp.abs(y - py))
            wx = jnp.maximum(0.0, 1.0 - jnp.abs(x - px))
            ry = (py >> 1) - cys                    # {0, 1}
            rx = (px >> 1) - cxs
            slot = (py & 1) * 2 + (px & 1)
            oh = (jax.nn.one_hot(ry, 2)[..., :, None, None]
                  * jax.nn.one_hot(rx, 2)[..., None, :, None]
                  * jax.nn.one_hot(slot, 4)[..., None, None, :])
            wt = wt + (wy * wx)[..., None, None, None] * oh

    ph4 = ph.reshape(B, H2, W2, 4 * F)
    dnums = jax.lax.GatherDimensionNumbers(
        offset_dims=(2, 3, 4),
        collapsed_slice_dims=(),
        start_index_map=(1, 2),
        operand_batching_dims=(0,),
        start_indices_batching_dims=(0,),
    )
    patch = jax.lax.gather(
        ph4, jnp.stack([cys, cxs], axis=-1), dnums,
        slice_sizes=(1, 2, 2, 4 * F),
        mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS)
    patch = patch.reshape(B, -1, 2, 2, 4, F)        # (B, N, ry, rx, slot, F)

    w_fold = (jax.lax.rsqrt(var + eps) * scale).astype(in_dtype)
    post = (patch - mean.astype(in_dtype)) * w_fold + bias.astype(in_dtype)
    z = jnp.maximum(post, 0)
    return jnp.einsum('bnxys,bnxysf->bnf', wt.astype(in_dtype), z)
