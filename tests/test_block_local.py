"""Oracle tests for Morton sorting + block-local nested grouping."""

import numpy as np
import jax.numpy as jnp

from epnet_tpu.ops.block_local import (block_local_available,
                                       block_local_group_nested)
from epnet_tpu.ops.morton import morton_argsort_np, morton_code_np
from epnet_tpu.utils.testing import structured_scene


def _part1by1_slow(v):
    out = 0
    for b in range(16):
        out |= ((v >> b) & 1) << (2 * b)
    return out


def test_morton_bit_interleave_matches_slow_reference():
    rng = np.random.RandomState(0)
    xyz = rng.uniform(-40, 40, (1, 64, 3)).astype(np.float32)
    codes = morton_code_np(xyz)[0]
    x, z = xyz[0, :, 0], xyz[0, :, 2]
    qx = np.clip((x - x.min()) / max(x.max() - x.min(), 1e-6) * 65535,
                 0, 65535).astype(np.uint32)
    qz = np.clip((z - z.min()) / max(z.max() - z.min(), 1e-6) * 65535,
                 0, 65535).astype(np.uint32)
    want = np.array([_part1by1_slow(int(a)) | (_part1by1_slow(int(c)) << 1)
                     for a, c in zip(qx, qz)], dtype=np.uint32)
    np.testing.assert_array_equal(codes, want)


def test_morton_sort_improves_neighbour_locality():
    """Mean |array-position delta| to the nearest spatial neighbour must
    shrink dramatically vs a shuffled order."""
    rng = np.random.RandomState(1)
    pts, _, _ = structured_scene(rng, 2048, n_cars=4)
    xyz = pts[:, :3]
    perm = morton_argsort_np(xyz)
    s = xyz[perm]
    d2 = np.sum((s[:, None, :] - s[None, :, :]) ** 2, axis=-1)
    np.fill_diagonal(d2, np.inf)
    nn = np.argmin(d2, axis=1)
    delta_sorted = np.abs(nn - np.arange(len(nn))).mean()
    d2r = np.sum((xyz[:, None, :] - xyz[None, :, :]) ** 2, axis=-1)
    np.fill_diagonal(d2r, np.inf)
    nnr = np.argmin(d2r, axis=1)
    delta_rand = np.abs(nnr - np.arange(len(nnr))).mean()
    assert delta_sorted < delta_rand / 10, (delta_sorted, delta_rand)


def _brute_nearest_first(xyz, cen, r_max, s_max):
    """Full-cloud exact nearest-first ball members (global oracle)."""
    d2 = np.sum((cen[:, None, :] - xyz[None, :, :]) ** 2, axis=-1)
    order = np.argsort(d2, axis=1, kind='stable')
    out_idx = np.zeros((len(cen), s_max), np.int64)
    out_cnt = np.zeros((len(cen),), np.int64)
    for j in range(len(cen)):
        hits = [i for i in order[j] if d2[j, i] < r_max * r_max][:s_max]
        out_cnt[j] = len(hits)
        row = hits + [hits[0] if hits else 0] * (s_max - len(hits))
        out_idx[j] = row[:s_max]
    return out_idx, out_cnt


def _setup(seed=2, n=2048, m=512, window=512, block_c=64):
    rng = np.random.RandomState(seed)
    pts, _, _ = structured_scene(rng, n, n_cars=6)
    xyz = pts[:, :3].astype(np.float32)
    xyz = xyz[morton_argsort_np(xyz)]
    feats = rng.randn(n, 5).astype(np.float32)
    table = np.concatenate([xyz, feats], axis=-1)
    parents = np.sort(rng.choice(n, m, replace=False)).astype(np.int32)
    return table, xyz, parents, window, block_c


def test_block_local_matches_global_oracle_where_window_covers():
    table, xyz, parents, window, block_c = _setup()
    radii, ns = (0.2, 0.6), (8, 16)
    gx, gf, cnts = block_local_group_nested(
        radii, ns, jnp.asarray(table[None, :, :3]),
        jnp.asarray(table[None, :, 3:]), jnp.asarray(parents[None]),
        window=window, block_c=block_c, approx=False)
    grouped = np.concatenate([np.asarray(gx[0]), np.asarray(gf[0])], -1)
    cnt_outer = np.asarray(cnts[-1][0])
    cen = xyz[parents]
    g_idx, g_cnt = _brute_nearest_first(xyz, cen, radii[-1], ns[-1])

    nb = len(parents) // block_c
    pb = parents.reshape(nb, block_c)
    starts = np.clip((pb[:, 0] + pb[:, -1]) // 2 - window // 2,
                     0, len(xyz) - window)
    covered = exact = 0
    for j in range(len(parents)):
        lo = starts[j // block_c]
        members = g_idx[j][:g_cnt[j]]
        if g_cnt[j] and members.min() >= lo and members.max() < lo + window:
            covered += 1
            # same members (distance ties can reorder) and same count
            want = np.sort(np.unique(table[members], axis=0), axis=0)
            got_rows = grouped[j][:min(g_cnt[j], ns[-1])]
            got = np.sort(np.unique(got_rows, axis=0), axis=0)
            if (cnt_outer[j] == g_cnt[j] and want.shape == got.shape
                    and np.allclose(want, got, atol=1e-5)):
                exact += 1
    assert covered > len(parents) * 0.8, covered   # windows mostly cover
    assert exact > covered * 0.95, (exact, covered)


def test_block_local_prefix_counts_and_padding():
    table, xyz, parents, window, block_c = _setup(seed=3)
    radii, ns = (0.2, 0.6), (8, 16)
    gx, gf, cnts = block_local_group_nested(
        radii, ns, jnp.asarray(table[None, :, :3]),
        jnp.asarray(table[None, :, 3:]), jnp.asarray(parents[None]),
        window=window, block_c=block_c, approx=False)
    grouped = np.concatenate([np.asarray(gx[0]), np.asarray(gf[0])], -1)
    c_in, c_out = np.asarray(cnts[0][0]), np.asarray(cnts[-1][0])
    assert (c_in <= c_out).all()
    cen = xyz[parents]
    # rows are nearest-first: distances must be non-decreasing over the
    # first c_out slots; every in-count row is inside the outer radius
    for j in range(0, len(parents), 37):
        k = min(c_out[j], ns[-1])
        if k == 0:
            continue
        d = np.linalg.norm(grouped[j, :k, :3] - cen[j], axis=-1)
        assert (np.diff(d) >= -1e-4).all(), (j, d)
        assert (d < radii[-1] + 1e-4).all()
        # padding slots repeat slot 0
        if k < ns[-1]:
            np.testing.assert_allclose(grouped[j, k:],
                                       np.repeat(grouped[j, 0:1], ns[-1] - k,
                                                 axis=0), atol=1e-6)


def test_block_local_recall_on_structured_scene():
    """Global neighbour recall must stay high on a realistic scene."""
    table, xyz, parents, window, block_c = _setup(seed=4)
    radii, ns = (0.2, 0.6), (8, 16)
    _, _, cnts = block_local_group_nested(
        radii, ns, jnp.asarray(table[None, :, :3]),
        jnp.asarray(table[None, :, 3:]), jnp.asarray(parents[None]),
        window=window, block_c=block_c, approx=False)
    cnt_outer = np.asarray(cnts[-1][0])
    cen = xyz[parents]
    _, g_cnt = _brute_nearest_first(xyz, cen, radii[-1], ns[-1])
    recall = cnt_outer.sum() / max(g_cnt.sum(), 1)
    assert recall > 0.85, recall


def test_block_local_available_gate():
    assert block_local_available(16384, 4096, 1024, 128)
    assert not block_local_available(1024, 256, 1024, 128)   # window >= N
    assert not block_local_available(16384, 4096, 1000, 128) # lane align
    assert not block_local_available(16384, 4095, 1024, 128) # tiling


def test_sa_module_block_local_close_to_dense_path():
    """SAModuleMSG with block_local on a Morton-sorted cloud must produce
    features close to the dense nested path (same params): the only
    differences are window-clipped neighbours (~2% at these shapes) and
    approx-select tie handling."""
    import jax
    from epnet_tpu.models.pointnet2 import SAModuleMSG
    from epnet_tpu.ops import pointops

    rng = np.random.RandomState(7)
    pts, _, _ = structured_scene(rng, 2048, n_cars=6)
    xyz = pts[:, :3].astype(np.float32)
    xyz = xyz[morton_argsort_np(xyz)]
    feats = rng.randn(2048, 8).astype(np.float32)
    xyz_j = jnp.asarray(xyz[None])
    feats_j = jnp.asarray(feats[None])

    old = pointops.EXACT_QUERIES
    pointops.EXACT_QUERIES = False  # force the approx/nested family on CPU
    try:
        kw = dict(npoint=256, radii=(0.5, 1.5), nsamples=(8, 16),
                  mlps=((8, 8, 16), (8, 8, 16)), use_xyz=True, bn=False,
                  sampler='fps')
        mod_bl = SAModuleMSG(block_local=True, block_window=1024, block_c=64,
                             **kw)
        mod_d = SAModuleMSG(block_local=False, **kw)
        v = mod_d.init(jax.random.PRNGKey(0), xyz_j, feats_j)
        nx_d, f_d, idx_d = mod_d.apply(v, xyz_j, feats_j)
        nx_b, f_b, idx_b = mod_bl.apply(v, xyz_j, feats_j)
    finally:
        pointops.EXACT_QUERIES = old

    # block-local sorts the fps selection; same SET of centroids
    np.testing.assert_array_equal(np.sort(np.asarray(idx_d), -1),
                                  np.asarray(idx_b))
    assert (np.diff(np.asarray(idx_b)[0]) > 0).all()
    np.testing.assert_allclose(
        np.asarray(nx_b), np.take_along_axis(xyz[None], np.asarray(idx_b)[..., None], 1),
        atol=1e-6)
    # align dense output to the sorted centroid order
    order = np.argsort(np.asarray(idx_d)[0])
    fd = np.asarray(f_d)[0][order]
    fb = np.asarray(f_b)[0]
    rel = np.abs(fd - fb) / (np.abs(fd) + 1e-3)
    assert (rel < 0.02).mean() > 0.9, (rel < 0.02).mean()
    assert np.isfinite(fb).all()


def test_block_local_fp_interp_exact_when_window_covers_all():
    """window == M covers every known -> identical neighbours/weights to the
    exact three_nn + three_interpolate path (f32)."""
    from epnet_tpu.ops.block_local import block_local_three_interp
    from epnet_tpu.ops.pointops import three_interpolate, three_nn

    rng = np.random.RandomState(3)
    pts, _, _ = structured_scene(rng, 1024, n_cars=4)
    xyz = pts[:, :3].astype(np.float32)
    xyz = xyz[morton_argsort_np(xyz)]
    kidx = np.sort(rng.choice(1024, 256, replace=False)).astype(np.int32)
    known = xyz[kidx]
    feats = rng.randn(256, 16).astype(np.float32)

    u = jnp.asarray(xyz[None])
    k = jnp.asarray(known[None])
    f = jnp.asarray(feats[None])
    got = block_local_three_interp(u, k, f, jnp.asarray(kidx[None]),
                                   ublock=128, window=256)

    dist, idx = three_nn(u, k, exact=True)
    recip = 1.0 / (dist + 1e-8)
    w = recip / jnp.sum(recip, -1, keepdims=True)
    want = three_interpolate(f, idx, w)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-5)


def test_block_local_fp_interp_windowed_close_to_exact():
    """Realistic window (subset of knowns per block): the vast majority of
    rows must match the exact interpolation; misses degrade gracefully."""
    from epnet_tpu.ops.block_local import block_local_three_interp
    from epnet_tpu.ops.pointops import three_interpolate, three_nn

    rng = np.random.RandomState(4)
    pts, _, _ = structured_scene(rng, 4096, n_cars=6)
    xyz = pts[:, :3].astype(np.float32)
    xyz = xyz[morton_argsort_np(xyz)]
    kidx = np.sort(rng.choice(4096, 1024, replace=False)).astype(np.int32)
    known = xyz[kidx]
    feats = rng.randn(1024, 16).astype(np.float32)

    u = jnp.asarray(xyz[None])
    k = jnp.asarray(known[None])
    f = jnp.asarray(feats[None])
    got = np.asarray(block_local_three_interp(
        u, k, f, jnp.asarray(kidx[None]), ublock=512, window=256))[0]

    dist, idx = three_nn(u, k, exact=True)
    recip = 1.0 / (dist + 1e-8)
    w = recip / jnp.sum(recip, -1, keepdims=True)
    want = np.asarray(three_interpolate(f, idx, w))[0]

    rel = np.abs(got - want).max(-1) / (np.abs(want).max(-1) + 1e-3)
    frac_exact = (rel < 1e-4).mean()
    assert frac_exact > 0.9, frac_exact
    assert np.isfinite(got).all()


def test_block_local_group_multi_member_recall():
    """Strided-bucket grouping must recover most in-radius members on a
    Morton-sorted structured scene (collisions only when a ball spans more
    window lanes than nsample)."""
    from epnet_tpu.ops.block_local import block_local_group_multi

    rng = np.random.RandomState(11)
    pts, _, _ = structured_scene(rng, 4096, n_cars=6)
    xyz = pts[:, :3].astype(np.float32)
    xyz = xyz[morton_argsort_np(xyz)]
    parents = np.sort(rng.choice(4096, 1024, replace=False)).astype(np.int32)
    cen = xyz[parents]
    radii, ns = (0.5, 1.0), (16, 32)

    groups = block_local_group_multi(
        radii, ns, jnp.asarray(xyz[None]), None, jnp.asarray(parents[None]),
        jnp.asarray(cen[None]), window=1024, block_c=128)

    d2 = np.sum((cen[:, None, :] - xyz[None, :, :]) ** 2, axis=-1)
    for (gx, _), r, s in zip(groups, radii, ns):
        got = np.asarray(gx)[0]  # (M, s, 3)
        rec = []
        for m in range(0, 1024, 7):
            true = {tuple(np.round(xyz[i], 5))
                    for i in np.where(d2[m] < r * r)[0]}
            if not true:
                continue
            sel = {tuple(np.round(p, 5)) for p in got[m]}
            rec.append(len(sel & true) / min(len(true), s))
        assert np.mean(rec) > 0.85, (r, s, np.mean(rec))
        assert np.isfinite(got).all()


def test_block_local_group_multi_bitexact_vs_index_semantics():
    """The strided candidate-one-hot gather must reproduce the bucket-select
    index semantics bit-exactly: slot j takes the nearest in-radius window
    lane among {l : l % ns == j}; empty slots take the window's nearest
    lane; all-empty balls take window row 0."""
    from epnet_tpu.ops.block_local import block_local_group_multi

    rng = np.random.RandomState(3)
    pts, _, _ = structured_scene(rng, 4096, n_cars=5)
    xyz = pts[:, :3].astype(np.float32)
    xyz = xyz[morton_argsort_np(xyz)]
    feats = rng.randn(4096, 8).astype(np.float32)
    parents = np.sort(rng.choice(4096, 1024, replace=False)).astype(np.int32)
    cen = xyz[parents]
    # drive some balls empty / short with a tiny inner radius
    radii, ns = (0.05, 0.8), (16, 32)
    window, block_c = 1024, 128

    groups = block_local_group_multi(
        radii, ns, jnp.asarray(xyz[None]), jnp.asarray(feats[None]),
        jnp.asarray(parents[None]), jnp.asarray(cen[None]),
        window=window, block_c=block_c)

    NB = 1024 // block_c
    mid = (parents.reshape(NB, block_c)[:, 0]
           + parents.reshape(NB, block_c)[:, -1]) // 2
    starts = np.clip(mid - window // 2, 0, 4096 - window)
    for (gx, gf), r, s in zip(groups, radii, ns):
        gx, gf = np.asarray(gx)[0], np.asarray(gf)[0]
        for m in range(0, 1024, 17):
            w0 = starts[m // block_c]
            wxy = xyz[w0:w0 + window]
            d2 = np.sum((cen[m] - wxy) ** 2, axis=-1)
            keys = np.where(d2 < r * r, d2, np.inf)
            kr = keys.reshape(window // s, s)
            cstar = np.argmin(kr, axis=0)
            valid = np.isfinite(kr.min(axis=0))
            idx = cstar * s + np.arange(s)
            idx = np.where(valid, idx, np.argmin(d2))
            if not valid.any():
                idx[:] = 0
            np.testing.assert_array_equal(gx[m], wxy[idx])
            np.testing.assert_array_equal(
                gf[m], feats[w0:w0 + window][idx])


def test_fp_window_middle_mode_wiring_and_engagement():
    """RPN.FP_WINDOW > 0 (round-5 middle mode): SA grouping stays dense but
    FPS picks are sorted ascending, levels stay Morton-sorted, and exactly
    the FP stages whose shapes qualify take the windowed interpolation at
    the configured width. Output must be finite and the windowed stage must
    actually engage (captured via a recording wrapper)."""
    import jax
    from epnet_tpu.models import pointnet2 as p2
    from epnet_tpu.models.backbone import PointBackbone
    from epnet_tpu.ops import pointops
    from epnet_tpu.utils.testing import tiny_config

    cfg = tiny_config(li_fusion=False, rcnn=False)
    cfg = cfg.merged({'RPN': {
        'NUM_POINTS': 2048, 'FP_WINDOW': 512, 'FP_UBLOCK': 256,
        'SA_CONFIG': {'NPOINTS': (512, 128, 64, 32)}}})
    assert cfg.RPN.BLOCK_LOCAL is False  # middle mode, not block-local

    rng = np.random.RandomState(11)
    pts, _, _ = structured_scene(rng, 2048, n_cars=6)
    xyz = pts[:, :3].astype(np.float32)
    xyz = xyz[morton_argsort_np(xyz)]
    x = jnp.asarray(xyz[None])

    calls = []
    orig = p2.block_local_three_interp

    def recording(unknown, known, feats, kidx, ublock, window):
        # known_idx must be ascending (sorted FPS picks) for the windowed
        # bisection to be valid
        assert (np.diff(np.asarray(kidx)[0]) > 0).all()
        calls.append((unknown.shape[1], known.shape[1], ublock, window))
        return orig(unknown, known, feats, kidx, ublock=ublock, window=window)

    old_q = pointops.EXACT_QUERIES
    pointops.EXACT_QUERIES = False
    p2.block_local_three_interp = (
        lambda u, k, f, i, ublock, window: recording(u, k, f, i, ublock, window))
    try:
        bb = PointBackbone(cfg)
        v = bb.init(jax.random.PRNGKey(0), x)
        out_xyz, out_feats = bb.apply(v, x)
    finally:
        p2.block_local_three_interp = orig
        pointops.EXACT_QUERIES = old_q

    # only fp0 qualifies (unknown 2048 % 256 == 0, knowns 512 >= window 512);
    # fp1..fp3 have too few knowns and must stay dense. Two traces: init +
    # apply.
    assert calls == [(2048, 512, 256, 512)] * 2, calls
    assert np.isfinite(np.asarray(out_feats)).all()
    assert out_feats.shape == (1, 2048, cfg.RPN.FP_MLPS[0][-1])
