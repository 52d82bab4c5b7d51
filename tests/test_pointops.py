"""Unit tests for point primitives against brute-force numpy oracles.

Oracles implement the CUDA semantics documented in SURVEY.md §2.1
(sampling_gpu.cu, ball_query_gpu.cu, group_points_gpu.cu,
interpolate_gpu.cu) independently in numpy.
"""

import numpy as np
import pytest

from epnet_tpu.ops import (
    ball_query,
    furthest_point_sample_xla,
    gather_points,
    group_points,
    three_interpolate,
    three_nn,
)


def np_fps(xyz, npoint):
    B, N, _ = xyz.shape
    idxs = np.zeros((B, npoint), dtype=np.int64)
    for b in range(B):
        mind = np.full(N, 1e10, dtype=np.float64)
        last = 0
        for j in range(1, npoint):
            d = np.sum((xyz[b] - xyz[b, last]) ** 2, axis=-1)
            mind = np.minimum(mind, d)
            last = int(np.argmax(mind))
            idxs[b, j] = last
    return idxs


def np_ball_query(radius, nsample, xyz, new_xyz):
    B, N, _ = xyz.shape
    M = new_xyz.shape[1]
    out = np.zeros((B, M, nsample), dtype=np.int64)
    for b in range(B):
        for m in range(M):
            cnt = 0
            for k in range(N):
                d2 = np.sum((new_xyz[b, m] - xyz[b, k]) ** 2)
                if d2 < radius * radius:
                    if cnt == 0:
                        out[b, m, :] = k
                    out[b, m, cnt] = k
                    cnt += 1
                    if cnt >= nsample:
                        break
    return out


@pytest.fixture(scope='module')
def rng():
    return np.random.RandomState(0)


def test_fps_matches_oracle(rng):
    xyz = rng.randn(2, 128, 3).astype(np.float32)
    got = np.asarray(furthest_point_sample_xla(xyz, 32))
    want = np_fps(xyz.astype(np.float64), 32)
    np.testing.assert_array_equal(got, want)


def test_fps_selects_distinct_points(rng):
    xyz = rng.randn(1, 256, 3).astype(np.float32)
    idx = np.asarray(furthest_point_sample_xla(xyz, 64))[0]
    assert len(set(idx.tolist())) == 64
    assert idx[0] == 0


def test_ball_query_matches_oracle(rng):
    xyz = rng.randn(2, 200, 3).astype(np.float32)
    new_xyz = xyz[:, :40]
    got = np.asarray(ball_query(0.8, 16, xyz, new_xyz))
    want = np_ball_query(0.8, 16, xyz, new_xyz)
    np.testing.assert_array_equal(got, want)


def test_ball_query_empty_ball(rng):
    xyz = np.ones((1, 64, 3), dtype=np.float32) * 100.0
    new_xyz = np.zeros((1, 4, 3), dtype=np.float32)
    got = np.asarray(ball_query(0.5, 8, xyz, new_xyz))
    np.testing.assert_array_equal(got, 0)


def test_ball_query_chunked_path(rng):
    # force chunking with a tiny element budget
    xyz = rng.randn(2, 64, 3).astype(np.float32)
    new_xyz = xyz[:, :32]
    a = np.asarray(ball_query(0.9, 8, xyz, new_xyz))
    b = np.asarray(ball_query(0.9, 8, xyz, new_xyz, max_block_elems=256))
    np.testing.assert_array_equal(a, b)


def test_gather_and_group(rng):
    pts = rng.randn(2, 50, 7).astype(np.float32)
    idx = rng.randint(0, 50, size=(2, 10)).astype(np.int32)
    got = np.asarray(gather_points(pts, idx))
    for b in range(2):
        np.testing.assert_array_equal(got[b], pts[b, idx[b]])

    gidx = rng.randint(0, 50, size=(2, 10, 4)).astype(np.int32)
    ggot = np.asarray(group_points(pts, gidx))
    for b in range(2):
        np.testing.assert_array_equal(ggot[b], pts[b][gidx[b]])


def test_three_nn_matches_bruteforce(rng):
    unknown = rng.randn(2, 100, 3).astype(np.float32)
    known = rng.randn(2, 30, 3).astype(np.float32)
    dist, idx = three_nn(unknown, known)
    dist, idx = np.asarray(dist), np.asarray(idx)
    for b in range(2):
        d2 = np.sum((unknown[b][:, None] - known[b][None]) ** 2, axis=-1)
        order = np.argsort(d2, axis=1)[:, :3]
        np.testing.assert_array_equal(np.sort(idx[b], axis=1), np.sort(order, axis=1))
        np.testing.assert_allclose(
            np.sort(dist[b], axis=1), np.sort(np.sqrt(np.take_along_axis(d2, order, 1)), axis=1),
            rtol=1e-4, atol=1e-5)


def test_three_interpolate(rng):
    feats = rng.randn(1, 20, 5).astype(np.float32)
    idx = rng.randint(0, 20, size=(1, 40, 3)).astype(np.int32)
    w = rng.rand(1, 40, 3).astype(np.float32)
    got = np.asarray(three_interpolate(feats, idx, w))
    want = np.einsum('nkc,nk->nc', feats[0][idx[0]], w[0])
    np.testing.assert_allclose(got[0], want, rtol=1e-5, atol=1e-5)


def test_roipool3d_bf16_packed_gather(rng):
    """16-bit packed table: xyz must come back bit-exact, features equal the
    bf16 values of the f32-path selection (same indices)."""
    import jax.numpy as jnp
    from epnet_tpu.ops.roipool3d import roipool3d
    B, N, M, S, C = 2, 256, 6, 32, 9
    pts = rng.uniform(-10, 10, (B, N, 3)).astype(np.float32)
    feats = rng.randn(B, N, C).astype(np.float32)
    boxes = np.zeros((B, M, 7), np.float32)
    boxes[..., 0] = rng.uniform(-8, 8, (B, M))
    boxes[..., 2] = rng.uniform(-8, 8, (B, M))
    boxes[..., 3:6] = rng.uniform(2.0, 5.0, (B, M, 3))

    px32, pf32, e32, c32 = roipool3d(pts, feats, boxes, 0.5, sampled_pt_num=S,
                                exact=True)
    px16, pf16, e16, c16 = roipool3d(pts, jnp.asarray(feats, jnp.bfloat16), boxes,
                                0.5, sampled_pt_num=S, exact=True)
    np.testing.assert_array_equal(np.asarray(e32), np.asarray(e16))
    np.testing.assert_array_equal(np.asarray(px32), np.asarray(px16))
    assert pf16.dtype == jnp.bfloat16
    np.testing.assert_array_equal(
        np.asarray(pf32, np.float32).astype(jnp.bfloat16),
        np.asarray(pf16))


def test_roipool3d_matches_oracle(rng):
    """Exact roipool3d vs a numpy oracle of the CUDA 3-kernel pipeline
    (roipool3d_kernel.cu:97-195): first-S in-box indices in ascending
    order, cyclic duplication below S, all-zero output + flag for empty
    boxes."""
    from epnet_tpu.data.box_np import points_in_boxes3d as np_in_boxes
    from epnet_tpu.ops.boxes import enlarge_box3d
    from epnet_tpu.ops.roipool3d import roipool3d

    B, N, M, S, C = 2, 300, 5, 32, 4
    pts = rng.uniform(-10, 10, (B, N, 3)).astype(np.float32)
    feats = rng.randn(B, N, C).astype(np.float32)
    boxes = np.zeros((B, M, 7), np.float32)
    boxes[..., 0] = rng.uniform(-8, 8, (B, M))
    boxes[..., 1] = rng.uniform(-1, 1, (B, M))
    boxes[..., 2] = rng.uniform(-8, 8, (B, M))
    boxes[..., 3:6] = rng.uniform(1.0, 4.0, (B, M, 3))
    boxes[..., 6] = rng.uniform(-np.pi, np.pi, (B, M))
    # one guaranteed-empty box far away
    boxes[:, -1, 0] = 100.0

    extra = 0.5
    pxyz, pfeat, empty, cnt = roipool3d(pts, feats, boxes, extra, sampled_pt_num=S,
                                   exact=True)
    pooled = np.concatenate([np.asarray(pxyz), np.asarray(pfeat)], axis=-1)
    empty = np.asarray(empty)

    big = np.asarray(enlarge_box3d(boxes.reshape(-1, 7), extra)).reshape(B, M, 7)
    table = np.concatenate([pts, feats], axis=-1)
    for b in range(B):
        inb = np_in_boxes(pts[b], big[b])  # (M, N) bool
        for m in range(M):
            hits = np.flatnonzero(inb[m])
            if len(hits) == 0:
                assert empty[b, m] == 1
                np.testing.assert_array_equal(pooled[b, m], 0.0)
                continue
            assert empty[b, m] == 0
            sel = hits[:S]
            want = table[b][np.resize(sel, S)]  # cyclic duplication
            np.testing.assert_allclose(pooled[b, m], want, rtol=1e-6)


def test_ball_query_nested_nearest_prefix(rng):
    """Nested multi-scale query: distance-sorted slots, per-scale prefix
    counts, nearest-hit padding, empty-ball zeros (see ball_query_nested).

    Points sit on distance shells spaced ~5% apart so the bf16 key rounding
    (8 mantissa bits, ~0.4% resolution) cannot reorder or merge them.
    """
    from epnet_tpu.ops import pointops

    N = 32
    dists = 0.05 * (1.06 ** np.arange(N))  # 0.05 .. ~0.3, well separated
    dirs = rng.randn(N, 3)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    perm = rng.permutation(N)  # shuffle so nearest-first != index-first
    xyz = (dists[:, None] * dirs)[perm][None].astype(np.float32)  # (1, N, 3)
    cen = np.array([[[0.0, 0.0, 0.0]], [[50.0, 0, 0]]], np.float32)  # 2nd empty
    xyz = np.concatenate([xyz, xyz], axis=0)

    radii, ns = [0.10, 0.20], [4, 8]
    idx, cnts = pointops.ball_query_nested(radii, ns, xyz, cen.reshape(2, 1, 3))
    idx, cnts = np.asarray(idx), [np.asarray(c) for c in cnts]

    d = dists[perm]
    order = np.argsort(d)  # true nearest-first index order
    n_in = [int(np.sum(d < r)) for r in radii]

    # outer scale: the 8 nearest inside r2, ascending, padded with slot 0
    want = order[: min(ns[1], n_in[1])]
    got = idx[0, 0]
    np.testing.assert_array_equal(got[: len(want)], want)
    np.testing.assert_array_equal(got[len(want):],
                                  np.full(ns[1] - len(want), want[0]))
    assert cnts[1][0, 0] == min(n_in[1], ns[1])

    # inner scale: prefix count = slots inside r1
    assert cnts[0][0, 0] == min(n_in[0], ns[1])
    inner = np.where(np.arange(ns[0]) < cnts[0][0, 0], got[: ns[0]], got[0])
    want1 = order[: min(ns[0], n_in[0])]
    np.testing.assert_array_equal(inner[: len(want1)], want1)
    np.testing.assert_array_equal(inner[len(want1):],
                                  np.full(ns[0] - len(want1), want1[0]))

    # empty ball: index 0 everywhere, zero counts
    np.testing.assert_array_equal(idx[1, 0], 0)
    assert cnts[0][1, 0] == 0 and cnts[1][1, 0] == 0


@pytest.mark.parametrize('ns', [[4, 8], [8, 8]])
def test_sa_module_nested_matches_per_scale_nearest(rng, ns):
    """SAModuleMSG's nested grouping must equal the same module fed by
    per-scale nearest-first queries computed independently (exact top_k).

    ns=[8,8]: an inner scale with nsample equal to the outermost must STILL
    apply its (smaller) radius slot-select (regression: the prefix select
    used to early-return on matching widths)."""
    import jax
    import jax.numpy as jnp
    from epnet_tpu.models.pointnet2 import SAModuleMSG
    from epnet_tpu.ops import pointops

    B, N, C = 2, 64, 4
    xyz = rng.randn(B, N, 3).astype(np.float32)
    feats = rng.randn(B, N, C).astype(np.float32)
    radii = [0.8, 1.6]
    mod = SAModuleMSG(npoint=16, radii=radii, nsamples=ns,
                      mlps=[[8, 8], [8, 8]], bn=False)
    params = mod.init(jax.random.PRNGKey(0), jnp.asarray(xyz),
                      jnp.asarray(feats))

    import os
    old = pointops.EXACT_QUERIES
    pointops.EXACT_QUERIES = False  # approx path -> nested on
    # this test pins the NEAREST-FIRST nested implementation specifically
    # (the round-5 default is first_nested; its set-semantics test is
    # test_ball_query_nested_first_hit_matches_exact_sets)
    os.environ['EPNET_BALL_POLICY'] = 'nearest'
    try:
        nx, nf, _ = mod.apply(params, jnp.asarray(xyz), jnp.asarray(feats))
    finally:
        pointops.EXACT_QUERIES = old
        del os.environ['EPNET_BALL_POLICY']
    nx, nf = np.asarray(nx), np.asarray(nf)
    assert np.isfinite(nf).all()

    # oracle: nearest-first per-scale neighbourhoods around the same centroids
    cen = nx
    d2 = np.sum((cen[:, :, None, :] - xyz[:, None, :, :]) ** 2, -1)  # (B,M,N)
    outs = []
    for r, s in zip(radii, ns):
        idx = np.zeros((B, 16, s), np.int64)
        for b in range(B):
            for m in range(16):
                hits = np.argsort(d2[b, m], kind='stable')
                hits = hits[d2[b, m][hits] < r * r][:s]
                idx[b, m] = np.resize(hits, s) if len(hits) else 0
                if len(hits):
                    idx[b, m, len(hits):] = hits[0]  # pad = nearest hit
        # nested padding deviation: empty inner ball pads with the nearest
        # OUTER-ball point; replicate from the outer-scale hits
        if r != radii[-1]:
            for b in range(B):
                for m in range(16):
                    if not (d2[b, m] < r * r).any():
                        oh = np.argsort(d2[b, m], kind='stable')
                        oh = oh[d2[b, m][oh] < radii[-1] ** 2]
                        idx[b, m] = oh[0] if len(oh) else 0
        gx = np.take_along_axis(xyz[:, None], idx[..., None], 2) \
            - cen[:, :, None, :]
        gf = np.take_along_axis(feats[:, None], idx[..., None], 2)
        outs.append((idx, np.concatenate([gx, gf], -1)))

    # recompute the MLP+max with the module's own params on oracle groups
    from epnet_tpu.models.layers import SharedMLP
    ref_feats = []
    for i, (idx_i, g) in enumerate(outs):
        sub = {'params': params['params'][f'SharedMLP_{i}']}
        h = SharedMLP([8, 8], bn=False).apply(sub, jnp.asarray(g))
        ref_feats.append(np.asarray(jnp.max(h, axis=2)))
    ref = np.concatenate(ref_feats, -1)
    np.testing.assert_allclose(nf, ref, rtol=2e-4, atol=2e-4)


def test_fps_partitioned_matches_per_group_oracle(rng):
    """groups>1 = exact FPS on each interleaved index-slice, indices mapped
    back to the global cloud and round-interleaved."""
    from epnet_tpu.ops.pointops import furthest_point_sample

    B, N, G, npoint = 2, 64, 4, 16
    xyz = rng.randn(B, N, 3).astype(np.float32)
    got = np.asarray(furthest_point_sample(xyz, npoint, groups=G))
    assert got.shape == (B, npoint)

    for g in range(G):
        sub = xyz[:, g::G]                       # the interleaved slice
        want = np_fps(sub, npoint // G) * G + g  # global indices
        np.testing.assert_array_equal(got[:, g::G], want)
    # all distinct within each scene
    for b in range(B):
        assert len(set(got[b].tolist())) == npoint


def test_roipool3d_approx_pad_policy(rng):
    """Approx roipool3d pads short boxes by repeating the first found point
    (ball_query pad policy) instead of cycling; the distinct-point set per
    box must equal the exact path's first-S hits (see roipool3d docstring —
    approx_max_k at full recall on these tiny shapes finds every hit)."""
    from epnet_tpu.data.box_np import points_in_boxes3d as np_in_boxes
    from epnet_tpu.ops.boxes import enlarge_box3d
    from epnet_tpu.ops.roipool3d import roipool3d

    B, N, M, S, C = 2, 300, 5, 32, 4
    pts = rng.uniform(-10, 10, (B, N, 3)).astype(np.float32)
    feats = rng.randn(B, N, C).astype(np.float32)
    boxes = np.zeros((B, M, 7), np.float32)
    boxes[..., 0] = rng.uniform(-8, 8, (B, M))
    boxes[..., 1] = rng.uniform(-1, 1, (B, M))
    boxes[..., 2] = rng.uniform(-8, 8, (B, M))
    boxes[..., 3:6] = rng.uniform(1.0, 4.0, (B, M, 3))
    boxes[..., 6] = rng.uniform(-np.pi, np.pi, (B, M))
    boxes[:, -1, 0] = 100.0  # guaranteed empty

    extra = 0.5
    pxyz, pfeat, empty, cnt = roipool3d(pts, feats, boxes, extra, sampled_pt_num=S,
                                   exact=False)
    pooled = np.concatenate([np.asarray(pxyz), np.asarray(pfeat)], axis=-1)
    empty = np.asarray(empty)

    big = np.asarray(enlarge_box3d(boxes.reshape(-1, 7), extra)).reshape(B, M, 7)
    table = np.concatenate([pts, feats], axis=-1)
    for b in range(B):
        inb = np_in_boxes(pts[b], big[b])
        for m in range(M):
            hits = np.flatnonzero(inb[m])
            if len(hits) == 0:
                assert empty[b, m] == 1
                np.testing.assert_array_equal(pooled[b, m], 0.0)
                continue
            assert empty[b, m] == 0
            sel = hits[:S]
            want = table[b][sel]
            np.testing.assert_allclose(pooled[b, m, :len(sel)], want,
                                       rtol=1e-6)
            # pad slots repeat the first hit
            np.testing.assert_allclose(
                pooled[b, m, len(sel):],
                np.broadcast_to(table[b][sel[0]], (S - len(sel), 3 + C)),
                rtol=1e-6)


def test_roipool3d_approx_mask_score_reweighting(rng):
    """The cyclic-multiplicity reweighting used by proposal_target_layer on
    the approx (repeat-first-pad) layout must reproduce the reference
    statistic sum(cyc-dup seg)/S (proposal_target_layer.py:43) exactly when
    the same point set is recovered."""
    import jax.numpy as jnp
    from epnet_tpu.ops.roipool3d import roipool3d

    B, N, M, S, C = 2, 200, 6, 16, 2
    pts = rng.uniform(-6, 6, (B, N, 3)).astype(np.float32)
    feats = rng.rand(B, N, C).astype(np.float32)
    boxes = np.zeros((B, M, 7), np.float32)
    boxes[..., 0] = rng.uniform(-5, 5, (B, M))
    boxes[..., 2] = rng.uniform(-5, 5, (B, M))
    boxes[..., 3:6] = rng.uniform(1.0, 3.0, (B, M, 3))
    boxes[:, -1, 0] = 100.0  # empty box

    _, pf_e, _, _ = roipool3d(pts, feats, boxes, 0.2, sampled_pt_num=S,
                              exact=True)
    _, pf_a, _, cnt = roipool3d(pts, feats, boxes, 0.2, sampled_pt_num=S,
                                exact=False)
    want = np.asarray(jnp.sum(pf_e[..., 0], axis=-1) / S)

    c = np.clip(np.minimum(np.asarray(cnt), S), 1, None)
    slot = np.arange(S)
    w = np.where(slot[None, None] < c[..., None],
                 (S // c)[..., None] + (slot[None, None] < (S % c)[..., None]),
                 0).astype(np.float32)
    got = np.sum(np.asarray(pf_a[..., 0]) * w, axis=-1) / S
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_ball_query_nested_first_hit_matches_exact_sets():
    """First-hit nested (round-5 repair): where no truncation applies
    (outer ball fits in s_max, inner ball fits in nsample_i), the per-scale
    in-radius row sets derived via nested_radius_select must equal the
    EXACT first-hit ball_query's distinct-member sets."""
    import numpy as np
    import jax.numpy as jnp
    from epnet_tpu.ops.pointops import (ball_query,
                                        ball_query_nested_first_hit,
                                        nested_radius_select)

    rng = np.random.RandomState(5)
    xyz = rng.randn(2, 256, 3).astype(np.float32) * 1.5
    cen = xyz[:, ::16][:, :16]  # 16 centroids (cloud points -> nonempty)
    radii, ns = [0.4, 0.8], [8, 16]

    idx = np.asarray(ball_query_nested_first_hit(radii, ns, jnp.asarray(xyz),
                                                 jnp.asarray(cen)))
    # derive per-scale sets from gathered rows (the consumer's path)
    rows = np.stack([xyz[b][idx[b]] for b in range(2)])     # (B, M, S, 3)
    d2 = ((rows - cen[:, :, None, :]) ** 2).sum(-1)

    sel_in = np.asarray(nested_radius_select(
        jnp.asarray(rows), jnp.asarray(d2.astype(np.float32)),
        radii[0] ** 2, outer=False))

    ex0 = np.asarray(ball_query(radii[0], ns[0], jnp.asarray(xyz),
                                jnp.asarray(cen), exact=True))
    ex1 = np.asarray(ball_query(radii[1], ns[1], jnp.asarray(xyz),
                                jnp.asarray(cen), exact=True))

    checked = 0
    for b in range(2):
        for m in range(16):
            d2_all = ((xyz[b] - cen[b, m]) ** 2).sum(-1)
            cnt_out = (d2_all < radii[1] ** 2).sum()
            cnt_in = (d2_all < radii[0] ** 2).sum()
            if cnt_out > ns[1] or cnt_in > ns[0] or cnt_in == 0:
                continue
            checked += 1
            # outer scale: distinct indices == exact first-hit set
            got_out = set(idx[b, m].tolist())
            want_out = set(ex1[b, m].tolist())
            assert got_out == want_out, (b, m)
            # inner scale: the in-radius ROWS of the padded select == the
            # exact inner first-hit member set
            mask = d2[b, m] < radii[0] ** 2
            got_rows = {tuple(r) for r in sel_in[b, m][mask].tolist()}
            want_rows = {tuple(xyz[b][j].tolist()) for j in set(ex0[b, m].tolist())}
            assert got_rows == want_rows, (b, m)
            # padded slots repeat an in-radius row
            pad_rows = {tuple(r) for r in sel_in[b, m][~mask].tolist()}
            assert pad_rows <= got_rows or not pad_rows
    assert checked >= 8, checked
