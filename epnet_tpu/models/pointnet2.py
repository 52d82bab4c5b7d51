"""PointNet++ set-abstraction (MSG) and feature-propagation modules.

Functional rebuild of ``/root/reference/pointnet2_lib/pointnet2/
pointnet2_modules.py`` (SA base :19-72, MSG :75-109, FP :133-173) on the
padded-shape JAX ops. Feature tensors are channels-last (B, N, C); the
per-scale MLP over grouped neighbourhoods is a (B*M*S, C) matmul on the MXU
followed by a max over the sample axis.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.block_local import (block_local_available, block_local_fp_available,
                               block_local_group_multi,
                               block_local_three_interp, bucket_ball_query,
                               to_window_relative, window_starts)
from ..ops.pointops import (
    approx_allowed,
    block_local_allowed,
    ball_query,
    ball_query_multi,
    ball_query_nested,
    ball_query_nested_first_hit,
    ball_policy,
    nested_radius_select,
    furthest_point_sample,
    gather_points,
    group_points,
    three_interpolate,
    three_nn,
)
from ..ops.sa_fused import (fused_point_mlp_max, fused_point_mlp_max_win,
                            fused_sa_available, fused_sa_win_available)
from .layers import SharedMLP


def sa_uses_block_local(block_local, npoint, radii, nsamples, n,
                        window, block_c) -> bool:
    """The SA block-local gate, shared with PointBackbone (which must know
    whether a stage's fps indices come out ascending-sorted so the FP
    decoder can ride the windowed interpolation)."""
    if not block_local or npoint is None:
        return False
    radii_l, ns_l = list(radii), list(nsamples)
    return (radii_l == sorted(radii_l) and ns_l == sorted(ns_l)
            and block_local_allowed()
            and block_local_available(n, npoint, window, block_c))


def _shared_mlp_params(mlp: SharedMLP, cin: int, n_layers: int):
    """Materialize a SharedMLP's Dense params without running it.

    A zero-size-batch dummy call creates the (identically named, identically
    initialized) params; the raw kernels/biases are then read off the bound
    child so the fused Pallas path can consume them directly. The dummy
    matmul is dead code XLA eliminates.
    """
    _ = mlp(jnp.zeros((1, 1, cin), jnp.float32))
    p = mlp.variables['params']
    return [(p[f'PointwiseConv_{k}']['Dense_0']['kernel'],
             p[f'PointwiseConv_{k}']['Dense_0']['bias'])
            for k in range(n_layers)]


def nested_prefix_select(full, s_i: int, cnt, outer: bool):
    """Derive scale i's grouped rows from the nested outer-ball gather.

    Scale i = distance-sorted prefix of the outer ball; slots past the
    in-radius count repeat slot 0 (the nearest hit). Only the OUTERMOST
    scale is already pad-resolved in the gathered rows — an inner scale
    still needs its radius slot-select even when its nsample equals the
    outer one (its radius is smaller).

    :param full: (B, M, s_max, C) rows gathered by ``ball_query_nested``'s
        indices; cnt: (B, M) in-radius count for scale i.
    """
    if outer:
        return full
    sel = (jnp.arange(s_i, dtype=jnp.int32)[None, None, :]
           < cnt[:, :, None])[..., None]
    return jnp.where(sel, full[:, :, :s_i], full[:, :, 0:1])


class SAModuleMSG(nn.Module):
    """Multi-scale-grouping set abstraction.

    Returns (new_xyz (B, M, 3), new_features (B, M, sum(mlp[-1])), fps_idx
    (B, M)); the fps indices are surfaced for LI-Fusion's point->pixel
    bookkeeping exactly like the reference (pointnet2_modules.py:72,
    consumed at lib/net/pointnet2_msg.py:215-219).
    """

    npoint: Optional[int]
    radii: Sequence[float]
    nsamples: Sequence[int]
    mlps: Sequence[Sequence[int]]  # per-scale hidden sizes (without input dim)
    use_xyz: bool = True
    bn: bool = True
    dtype: object = None
    sampler: str = 'fps'  # 'fps' | 'random' (see Config.RPN.SAMPLING)
    fps_groups: int = 1   # partitioned FPS (see Config.RPN.FPS_GROUPS)
    # block-local grouping over Morton-sorted clouds (ops/block_local.py;
    # requires the loader's RPN.BLOCK_LOCAL point sort)
    block_local: bool = False
    block_window: int = 1024
    block_c: int = 128
    # sort FPS picks ascending even on the DENSE grouping path (the
    # RPN.FP_WINDOW middle mode): keeps every level Morton-sorted so the
    # FP decoder can ride the windowed interpolation while SA
    # neighbourhoods stay exact-field
    sort_fps: bool = False

    @nn.compact
    def __call__(self, xyz, features=None, train: bool = False, bn_momentum=0.1):
        use_bl = sa_uses_block_local(self.block_local, self.npoint,
                                     self.radii, self.nsamples, xyz.shape[1],
                                     self.block_window, self.block_c)
        # small spatially-ordered tables (the RCNN tower over roipool output
        # of a Morton-sorted cloud): windowed fused kernel — block-local
        # query + VMEM one-hot gather over a window slice of the layer-1
        # table (ops/sa_fused.py fused_point_mlp_max_win)
        use_win = (not use_bl and self.block_local and self.npoint is not None
                   and len(self.mlps) == 1 and len(self.mlps[0]) == 3
                   and block_local_allowed()
                   and xyz.shape[1] % self.nsamples[0] == 0
                   and fused_sa_win_available(
                       xyz.shape[1], self.npoint, self.nsamples[0],
                       *self.mlps[0], use_bn=self.bn,
                       window=self.block_window, block_c=self.block_c))
        if self.npoint is not None:
            if self.sampler == 'random':
                # input order is a shuffled subset (loader), so the first
                # npoint indices are already a uniform random sample
                fps_idx = jnp.broadcast_to(
                    jnp.arange(self.npoint, dtype=jnp.int32)[None],
                    (xyz.shape[0], self.npoint))
            else:
                fps_idx = furthest_point_sample(xyz, self.npoint,
                                                groups=self.fps_groups)
            if use_bl or use_win or self.sort_fps:
                # centroid order is free downstream (sample-max / FP interp
                # are order-invariant); ascending order keeps the selected
                # subset Morton-sorted so every deeper stage stays
                # block-local too
                fps_idx = jnp.sort(fps_idx, axis=-1)
            new_xyz = gather_points(xyz, fps_idx)
        else:  # group-all (reference GroupAll, pointnet2_utils.py:283-306)
            fps_idx = None
            new_xyz = None

        # Neighbourhood grouping is gather-bound. Gathering xyz (3ch) and
        # features separately wastes lanes (a 3-channel gather runs at ~1/20
        # of the 128-channel rate) and doubles the row count, so both are
        # packed into ONE gather table: xyz stays f32; in mixed precision the
        # bf16 features are bitcast in pairs into f32 lanes and unpacked
        # after the gather.
        # Small tables (N <= 1024) take group_points' one-hot MXU path, where
        # packing is unnecessary (and bitcast bit patterns must not transit
        # the MXU); big tables use one packed row gather.
        pack = xyz.shape[1] > 1024 and not use_bl
        gfeats = features
        packed_cols = 0
        if features is not None:
            if self.dtype is not None:
                gfeats = features.astype(self.dtype)
                if pack:
                    C = gfeats.shape[-1]
                    if C % 2:
                        gfeats = jnp.pad(gfeats, ((0, 0), (0, 0), (0, 1)))
                        C += 1
                    packed = jax.lax.bitcast_convert_type(
                        gfeats.reshape(*gfeats.shape[:-1], C // 2, 2), jnp.float32)
                    packed_cols = C // 2
                    table = jnp.concatenate([xyz, packed], axis=-1)
            elif pack:
                packed_cols = gfeats.shape[-1]
                table = jnp.concatenate([xyz, gfeats], axis=-1)
        if not pack or features is None:
            table = xyz

        def unpack_feats(g):
            if packed_cols == 0:
                return None
            gf = g[..., 3:3 + packed_cols]
            if self.dtype is not None:
                gf = jax.lax.bitcast_convert_type(gf, self.dtype)
                gf = gf.reshape(*gf.shape[:-2], gf.shape[-2] * 2)
                if features is not None and gf.shape[-1] != features.shape[-1]:
                    gf = gf[..., :features.shape[-1]]
            return gf

        scale_idx = nested_cnts = win_idx = win_starts = bl_groups = None
        nested_fh = False
        if use_win:
            # dense VPU field + global bucket select, then an elementwise
            # window-relative conversion (per-block slicing in the query is
            # slice-latency-bound; the field at these small N is cheap)
            gidx = bucket_ball_query(self.radii[0], self.nsamples[0], xyz,
                                     new_xyz)
            win_starts = window_starts(fps_idx, xyz.shape[1],
                                       self.block_window, self.block_c)
            win_idx = to_window_relative(gidx, win_starts, self.block_window)
        elif self.npoint is not None:
            radii, ns = list(self.radii), list(self.nsamples)
            # Monotone multi-scale configs on the approx path take the nested
            # nearest-first query: ONE field + ONE approx_max_k + ONE gather
            # of nsamples[-1] rows serves every scale (inner scales are
            # prefix-slices of the distance-sorted outer ball). Exact mode and
            # single-scale stages keep the per-scale paths.
            if use_bl:
                # Morton-sorted cloud: the query field and the gather both
                # collapse to block-local windows; each scale takes a
                # sort-free strided-bucket select (ops/block_local.py)
                bl_groups = block_local_group_multi(
                    radii, ns, xyz, gfeats, fps_idx, new_xyz,
                    window=self.block_window, block_c=self.block_c)
            elif (len(radii) > 1 and radii == sorted(radii) and ns == sorted(ns)
                    and approx_allowed('ball')
                    and ball_policy() != 'first_multi'):
                # selection policy (round-5 repair, ops/pointops.ball_policy):
                # first-hit nested keeps the reference's spread-subset
                # semantics at the one-field/one-gather nested price;
                # nearest-first is the round-2..4 policy (AP-collapsing at
                # full scale, kept for reproduction)
                nested_fh = ball_policy() == 'first_nested'
                if nested_fh:
                    nest_idx = ball_query_nested_first_hit(
                        radii, ns, xyz, new_xyz)
                else:
                    nest_idx, nested_cnts = ball_query_nested(
                        radii, ns, xyz, new_xyz)
                if pack:
                    g_full = group_points(table, nest_idx)
                else:
                    gx_full = group_points(xyz, nest_idx)
                    gf_full = (group_points(gfeats, nest_idx)
                               if gfeats is not None else None)
            elif (self.block_local and len(radii) == 1
                    and xyz.shape[1] % ns[0] == 0
                    and block_local_allowed() and approx_allowed('ball')):
                # small spatially-ordered table (deeper RCNN tower stage):
                # sort-free bucket select beats approx_max_k's aggregation
                # at narrow widths
                scale_idx = [bucket_ball_query(radii[0], ns[0], xyz, new_xyz)]
            else:
                # one shared distance field for all MSG scales
                scale_idx = ball_query_multi(self.radii, self.nsamples, xyz, new_xyz)

        outs = []
        for i, hidden in enumerate(self.mlps):
            # fused Pallas interior (gather + 3-layer MLP + sample max, all
            # in VMEM) for the no-BN lane-aligned stages — the RCNN tower
            # (rcnn_net.py:28-42: USE_BN false, 128/256-wide MLPs). The
            # SharedMLP is still constructed (same name, same params) so
            # checkpoints interchange with the unfused path.
            if (self.npoint is not None
                    and (win_idx is not None or scale_idx is not None)
                    and len(hidden) == 3
                    and fused_sa_available(xyz.shape[1], self.npoint,
                                           self.nsamples[i], *hidden,
                                           use_bn=self.bn)):
                mlp = SharedMLP(hidden, bn=self.bn, dtype=self.dtype)
                cin = 3 * int(self.use_xyz) + (
                    0 if gfeats is None else gfeats.shape[-1])
                (w1, b1), (w2, b2), (w3, b3) = _shared_mlp_params(mlp, cin, 3)
                cdt = self.dtype or jnp.float32
                parts = ([xyz.astype(cdt)] if self.use_xyz else [])
                if gfeats is not None:
                    parts.append(gfeats.astype(cdt))
                tbl = jnp.concatenate(parts, -1) if len(parts) > 1 else parts[0]
                wk = w1.astype(cdt)
                y = jnp.dot(tbl, wk) + b1.astype(cdt)
                if self.use_xyz:
                    o = jnp.dot(new_xyz.astype(cdt), wk[:3])
                else:
                    o = jnp.zeros((xyz.shape[0], self.npoint, hidden[0]), cdt)
                if win_idx is not None:
                    outs.append(fused_point_mlp_max_win(
                        y, o, win_idx, win_starts, w2.astype(cdt), b2,
                        w3.astype(cdt), b3, self.block_window))
                else:
                    outs.append(fused_point_mlp_max(
                        y, o, scale_idx[i], w2.astype(cdt), b2,
                        w3.astype(cdt), b3))
                continue
            if self.npoint is not None:
                if bl_groups is not None:
                    grouped_xyz = bl_groups[i][0] - new_xyz[:, :, None, :]
                    grouped = bl_groups[i][1]
                elif nested_fh:
                    # first-hit nested (round-5 repair): scale i keeps the
                    # gathered rows inside its own radius (set-exact
                    # first-hit semantics within the outer-s_max window);
                    # every scale feeds s_max rows to its MLP — the extra
                    # rows are pad duplicates, free under the sample-max
                    outer = i == len(self.nsamples) - 1
                    full = g_full if pack else gx_full
                    gx_f = full[..., 0:3] - new_xyz[:, :, None, :]
                    d2f = jnp.sum(gx_f * gx_f, axis=-1)  # f32, (B, M, s_max)
                    r2 = float(self.radii[i]) ** 2
                    if pack:
                        gt = nested_radius_select(g_full, d2f, r2, outer)
                        grouped_xyz = gt[..., 0:3] - new_xyz[:, :, None, :]
                        grouped = unpack_feats(gt)
                    else:
                        grouped_xyz = (nested_radius_select(gx_full, d2f, r2,
                                                            outer)
                                       - new_xyz[:, :, None, :])
                        grouped = (nested_radius_select(gf_full, d2f, r2,
                                                        outer)
                                   if gf_full is not None else None)
                elif nested_cnts is not None:
                    s_i = self.nsamples[i]

                    outer = i == len(self.nsamples) - 1

                    def prefix(full, s_i=s_i, cnt=nested_cnts[i], outer=outer):
                        return nested_prefix_select(full, s_i, cnt, outer)

                    if pack:
                        gt = prefix(g_full)
                        grouped_xyz = gt[..., 0:3] - new_xyz[:, :, None, :]
                        grouped = unpack_feats(gt)
                    else:
                        grouped_xyz = prefix(gx_full) - new_xyz[:, :, None, :]
                        grouped = prefix(gf_full) if gf_full is not None else None
                elif pack:
                    gt = group_points(table, scale_idx[i])
                    grouped_xyz = gt[..., 0:3] - new_xyz[:, :, None, :]
                    grouped = unpack_feats(gt)
                else:
                    idx = scale_idx[i]
                    grouped_xyz = group_points(xyz, idx) - new_xyz[:, :, None, :]
                    grouped = group_points(gfeats, idx) if gfeats is not None else None
                if self.dtype is not None:
                    grouped_xyz = grouped_xyz.astype(self.dtype)
                if grouped is not None:
                    g = jnp.concatenate([grouped_xyz, grouped], -1) if self.use_xyz else grouped
                else:
                    g = grouped_xyz
            else:
                # group all: (B, 1, N, 3 + C); xyz NOT recentred (GroupAll)
                g = xyz[:, None, :, :]
                if self.dtype is not None:
                    g = g.astype(self.dtype)
                if gfeats is not None:
                    g = jnp.concatenate([g, gfeats[:, None, :, :]], -1) if self.use_xyz \
                        else gfeats[:, None, :, :]
            g = SharedMLP(hidden, bn=self.bn, dtype=self.dtype)(
                g, train=train, bn_momentum=bn_momentum)
            outs.append(jnp.max(g, axis=2))  # max over the sample axis

        new_features = jnp.concatenate(outs, axis=-1)
        if new_xyz is None:
            new_xyz = jnp.zeros((xyz.shape[0], 1, 3), xyz.dtype)
        return new_xyz, new_features, fps_idx


class SAModule(SAModuleMSG):
    """Single-scale convenience wrapper (pointnet2_modules.py:112-130)."""


class FPModule(nn.Module):
    """Feature propagation: inverse-distance 3-NN interpolation + skip MLP
    (pointnet2_modules.py:133-173)."""

    mlp: Sequence[int]
    bn: bool = True
    dtype: object = None
    # block-local windowed interpolation (ops/block_local.py): valid when
    # both levels are Morton-sorted and known_idx gives the knowns'
    # ascending positions in the unknown array (see PointBackbone)
    block_local: bool = False
    ublock: int = 512
    window: int = 256

    @nn.compact
    def __call__(self, unknown, known, unknown_feats, known_feats,
                 train: bool = False, bn_momentum=0.1, known_idx=None):
        use_bl = (self.block_local and known is not None
                  and known_idx is not None and block_local_allowed()
                  and block_local_fp_available(unknown.shape[1],
                                               known.shape[1],
                                               self.ublock, self.window))
        if use_bl:
            if self.dtype is not None:
                known_feats = known_feats.astype(self.dtype)
            interp = block_local_three_interp(
                unknown, known, known_feats, known_idx,
                ublock=self.ublock, window=self.window)
        elif known is not None:
            dist, idx = three_nn(unknown, known)
            recip = 1.0 / (dist + 1e-8)
            weight = recip / jnp.sum(recip, axis=-1, keepdims=True)
            if self.dtype is not None:
                known_feats = known_feats.astype(self.dtype)
                weight = weight.astype(self.dtype)
            interp = three_interpolate(known_feats, idx, weight)  # (B, N, C2)
        else:
            interp = jnp.broadcast_to(
                known_feats, (known_feats.shape[0], unknown.shape[1], known_feats.shape[-1]))

        if unknown_feats is not None:
            x = jnp.concatenate([interp, unknown_feats], axis=-1)
        else:
            x = interp
        return SharedMLP(self.mlp, bn=self.bn, dtype=self.dtype)(
            x, train=train, bn_momentum=bn_momentum)
