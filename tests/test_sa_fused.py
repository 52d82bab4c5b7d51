"""Oracle tests for the fused SA interior (gather + MLP + sample-max).

The oracle is the unfused composition the kernel replaces
(rcnn_net.py:189-192 semantics): ``max_s relu(relu(relu(y[idx]-o) @ w2 + b2)
@ w3 + b3)``. Runs in Pallas interpreter mode off-TPU (tests/conftest pins
the CPU backend).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from epnet_tpu.ops.sa_fused import fused_point_mlp_max


def _oracle(y, o, idx, w2, b2, w3, b3):
    g = jnp.take_along_axis(y, idx.reshape(idx.shape[0], -1, 1), axis=1)
    g = g.reshape(*idx.shape, y.shape[-1]).astype(jnp.float32)
    h1 = jnp.maximum(g - o[:, :, None, :].astype(jnp.float32), 0.0)
    h2 = jnp.maximum(jnp.einsum('tmsc,cd->tmsd', h1, w2) + b2, 0.0)
    h3 = jnp.maximum(jnp.einsum('tmsc,cd->tmsd', h2, w3) + b3, 0.0)
    return jnp.max(h3, axis=2)


def _inputs(rng, T=3, N=128, M=16, S=8, C1=128, C2=128, C3=128,
            dtype=jnp.float32):
    y = jnp.asarray(rng.randn(T, N, C1), dtype)
    o = jnp.asarray(rng.randn(T, M, C1) * 0.1, dtype)
    idx = jnp.asarray(rng.randint(0, N, (T, M, S)), jnp.int32)
    w2 = jnp.asarray(rng.randn(C1, C2) / np.sqrt(C1), jnp.float32)
    b2 = jnp.asarray(rng.randn(C2) * 0.01, jnp.float32)
    w3 = jnp.asarray(rng.randn(C2, C3) / np.sqrt(C2), jnp.float32)
    b3 = jnp.asarray(rng.randn(C3) * 0.01, jnp.float32)
    return y, o, idx, w2, b2, w3, b3


def test_forward_f32_matches_oracle():
    rng = np.random.RandomState(0)
    args = _inputs(rng)
    got = fused_point_mlp_max(*args)
    want = _oracle(*args)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_forward_bf16_close_to_f32_oracle():
    rng = np.random.RandomState(1)
    y, o, idx, w2, b2, w3, b3 = _inputs(rng)
    got = fused_point_mlp_max(y.astype(jnp.bfloat16), o.astype(jnp.bfloat16),
                              idx, w2.astype(jnp.bfloat16), b2,
                              w3.astype(jnp.bfloat16), b3)
    want = _oracle(y, o, idx, w2, b2, w3, b3)
    err = np.abs(np.asarray(got, np.float32) - np.asarray(want))
    scale = np.abs(np.asarray(want)).max()
    assert err.max() / scale < 0.05, err.max() / scale


def test_forward_duplicate_and_padded_indices():
    # ball_query pads short balls by repeating the first hit; duplicates and
    # all-identical rows must not perturb the max
    rng = np.random.RandomState(2)
    y, o, idx, w2, b2, w3, b3 = _inputs(rng, T=2, M=8, S=8)
    idx = idx.at[:, 0, :].set(5)   # fully padded ball
    idx = idx.at[:, 1, 1:].set(idx[:, 1, 0:1])
    got = fused_point_mlp_max(y, o, idx, w2, b2, w3, b3)
    want = _oracle(y, o, idx, w2, b2, w3, b3)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_gradients_match_oracle():
    rng = np.random.RandomState(3)
    y, o, idx, w2, b2, w3, b3 = _inputs(rng, T=2, N=128, M=8, S=8)

    def loss_fused(y, o, w2, b2, w3, b3):
        out = fused_point_mlp_max(y, o, idx, w2, b2, w3, b3)
        return jnp.sum(out * jnp.cos(jnp.arange(out.size).reshape(out.shape)))

    def loss_oracle(y, o, w2, b2, w3, b3):
        out = _oracle(y, o, idx, w2, b2, w3, b3)
        return jnp.sum(out * jnp.cos(jnp.arange(out.size).reshape(out.shape)))

    gf = jax.grad(loss_fused, argnums=(0, 1, 2, 3, 4, 5))(y, o, w2, b2, w3, b3)
    go = jax.grad(loss_oracle, argnums=(0, 1, 2, 3, 4, 5))(y, o, w2, b2, w3, b3)
    for a, b, name in zip(gf, go, ['dy', 'do', 'dw2', 'db2', 'dw3', 'db3']):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-4, err_msg=name)


def test_multi_tile_grid():
    # M large enough to need several m-tiles per roi (exercises dy/dw
    # accumulation across grid steps)
    rng = np.random.RandomState(4)
    y, o, idx, w2, b2, w3, b3 = _inputs(rng, T=2, N=256, M=64, S=64)
    got = fused_point_mlp_max(y, o, idx, w2, b2, w3, b3)
    want = _oracle(y, o, idx, w2, b2, w3, b3)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)

    def loss(y):
        return jnp.sum(fused_point_mlp_max(y, o, idx, w2, b2, w3, b3) ** 2)

    def loss_o(y):
        return jnp.sum(_oracle(y, o, idx, w2, b2, w3, b3) ** 2)

    np.testing.assert_allclose(np.asarray(jax.grad(loss)(y)),
                               np.asarray(jax.grad(loss_o)(y)),
                               rtol=2e-3, atol=2e-3)


@pytest.mark.parametrize('use_xyz', [True, False])
def test_sa_module_fused_matches_unfused(monkeypatch, use_xyz):
    """SAModuleMSG with the fused path forced on must match the unfused
    module bit-for-bit in param structure and closely in value."""
    import epnet_tpu.models.pointnet2 as p2
    import epnet_tpu.ops.sa_fused as sf
    from epnet_tpu.models.pointnet2 import SAModuleMSG

    rng = np.random.RandomState(5)
    B, N, C = 2, 128, 128
    xyz = jnp.asarray(rng.randn(B, N, 3), jnp.float32)
    feats = jnp.asarray(rng.randn(B, N, C), jnp.float32)

    mod = SAModuleMSG(npoint=16, radii=(0.8,), nsamples=(8,),
                      mlps=((128, 128, 128),), use_xyz=use_xyz, bn=False)

    monkeypatch.setattr(p2, 'fused_sa_available', lambda *a, **k: False)
    v = mod.init(jax.random.PRNGKey(0), xyz, feats)
    ref_xyz, ref_feats, ref_idx = mod.apply(v, xyz, feats)

    monkeypatch.setattr(p2, 'fused_sa_available', lambda *a, **k: True)
    v2 = mod.init(jax.random.PRNGKey(0), xyz, feats)
    # identical param trees (names AND values) between the two paths
    ta = jax.tree_util.tree_structure(v)
    tb = jax.tree_util.tree_structure(v2)
    assert ta == tb
    for a, b in zip(jax.tree_util.tree_leaves(v), jax.tree_util.tree_leaves(v2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    got_xyz, got_feats, got_idx = mod.apply(v, xyz, feats)
    np.testing.assert_array_equal(np.asarray(ref_xyz), np.asarray(got_xyz))
    np.testing.assert_array_equal(np.asarray(ref_idx), np.asarray(got_idx))
    np.testing.assert_allclose(np.asarray(ref_feats), np.asarray(got_feats),
                               rtol=1e-4, atol=1e-4)


# ---------------------------------------------------------------------------
# Windowed variant (fused_point_mlp_max_win): indices are window-relative,
# the gather reads a per-tile slice of y located by `starts`.
# ---------------------------------------------------------------------------

def _win_inputs(rng, T=3, N=256, M=32, S=8, NB=4, W=64, C1=128, C2=128,
                C3=128, dtype=jnp.float32):
    y = jnp.asarray(rng.randn(T, N, C1), dtype)
    o = jnp.asarray(rng.randn(T, M, C1) * 0.1, dtype)
    idx = jnp.asarray(rng.randint(0, W, (T, M, S)), jnp.int32)
    starts = jnp.asarray(
        (rng.randint(0, (N - W) // 8 + 1, (T, NB)) * 8), jnp.int32)
    w2 = jnp.asarray(rng.randn(C1, C2) / np.sqrt(C1), jnp.float32)
    b2 = jnp.asarray(rng.randn(C2) * 0.01, jnp.float32)
    w3 = jnp.asarray(rng.randn(C2, C3) / np.sqrt(C2), jnp.float32)
    b3 = jnp.asarray(rng.randn(C3) * 0.01, jnp.float32)
    return y, o, idx, starts, w2, b2, w3, b3


def _win_to_global(idx, starts, M):
    NB = starts.shape[1]
    TM = M // NB
    return idx + jnp.repeat(starts, TM, axis=1)[..., None]


def test_windowed_forward_matches_oracle():
    from epnet_tpu.ops.sa_fused import fused_point_mlp_max_win

    rng = np.random.RandomState(10)
    y, o, idx, starts, w2, b2, w3, b3 = _win_inputs(rng)
    got = fused_point_mlp_max_win(y, o, idx, starts, w2, b2, w3, b3, 64)
    gidx = _win_to_global(idx, starts, o.shape[1])
    want = _oracle(y, o, gidx, w2, b2, w3, b3)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_windowed_bf16_close():
    from epnet_tpu.ops.sa_fused import fused_point_mlp_max_win

    rng = np.random.RandomState(11)
    y, o, idx, starts, w2, b2, w3, b3 = _win_inputs(rng)
    got = fused_point_mlp_max_win(
        y.astype(jnp.bfloat16), o.astype(jnp.bfloat16), idx, starts,
        w2.astype(jnp.bfloat16), b2, w3.astype(jnp.bfloat16), b3, 64)
    gidx = _win_to_global(idx, starts, o.shape[1])
    want = _oracle(y, o, gidx, w2, b2, w3, b3)
    err = np.abs(np.asarray(got, np.float32) - np.asarray(want))
    assert err.max() / np.abs(np.asarray(want)).max() < 0.05


def test_windowed_gradients_match_oracle():
    from epnet_tpu.ops.sa_fused import fused_point_mlp_max_win

    rng = np.random.RandomState(12)
    y, o, idx, starts, w2, b2, w3, b3 = _win_inputs(rng, T=2, NB=4)
    gidx = _win_to_global(idx, starts, o.shape[1])

    def loss_fused(y, o, w2, b2, w3, b3):
        out = fused_point_mlp_max_win(y, o, idx, starts, w2, b2, w3, b3, 64)
        return jnp.sum(out * jnp.cos(jnp.arange(out.size).reshape(out.shape)))

    def loss_oracle(y, o, w2, b2, w3, b3):
        out = _oracle(y, o, gidx, w2, b2, w3, b3)
        return jnp.sum(out * jnp.cos(jnp.arange(out.size).reshape(out.shape)))

    gf = jax.grad(loss_fused, argnums=(0, 1, 2, 3, 4, 5))(y, o, w2, b2, w3, b3)
    go = jax.grad(loss_oracle, argnums=(0, 1, 2, 3, 4, 5))(y, o, w2, b2, w3, b3)
    for a, b, name in zip(gf, go, ['dy', 'do', 'dw2', 'db2', 'dw3', 'db3']):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-4, err_msg=name)


def test_window_query_matches_global_when_local():
    """When every in-radius neighbour of a block's centroids lies inside its
    window (tightly sorted cloud, small radius), the windowed query must
    recover the same neighbour sets as the global ball query."""
    from epnet_tpu.ops.block_local import block_local_window_query
    from epnet_tpu.ops.pointops import ball_query

    rng = np.random.RandomState(13)
    T, N, M = 2, 512, 128
    # points sorted along x with tiny jitter -> 1D locality
    x = np.sort(rng.uniform(0, 100, (T, N))).astype(np.float32)
    xyz = np.stack([x, rng.randn(T, N).astype(np.float32) * 0.01,
                    rng.randn(T, N).astype(np.float32) * 0.01], -1)
    pidx = np.sort(rng.choice(N, M, replace=False)).astype(np.int32)
    pidx = np.broadcast_to(pidx, (T, M)).copy()
    xj = jnp.asarray(xyz)
    pj = jnp.asarray(pidx)
    cen = jnp.take_along_axis(xj, pj[..., None], axis=1)

    idx_rel, starts, cnt = block_local_window_query(
        0.3, 8, xj, pj, cen, window=256, block_c=32)
    TM = M // starts.shape[1]
    gidx = np.asarray(idx_rel) + np.repeat(np.asarray(starts), TM,
                                           axis=1)[..., None]

    ref = np.asarray(ball_query(0.3, 8, xj, cen, exact=True))
    match = 0
    for t in range(T):
        for m in range(M):
            match += set(gidx[t, m]) == set(ref[t, m])
    assert match / (T * M) > 0.95, match / (T * M)


def test_bucket_ball_query_matches_global_when_local():
    from epnet_tpu.ops.block_local import bucket_ball_query
    from epnet_tpu.ops.pointops import ball_query

    rng = np.random.RandomState(14)
    T, N, M, S = 2, 512, 128, 8
    x = np.sort(rng.uniform(0, 100, (T, N))).astype(np.float32)
    xyz = np.stack([x, rng.randn(T, N).astype(np.float32) * 0.01,
                    rng.randn(T, N).astype(np.float32) * 0.01], -1)
    pidx = np.sort(rng.choice(N, M, replace=False)).astype(np.int32)
    cen = jnp.asarray(xyz[:, pidx])
    xj = jnp.asarray(xyz)

    got = np.asarray(bucket_ball_query(0.3, S, xj, cen))
    ref = np.asarray(ball_query(0.3, S, xj, cen, exact=True))
    match = sum(set(got[t, m]) == set(ref[t, m])
                for t in range(T) for m in range(M))
    assert match / (T * M) > 0.95, match / (T * M)


def test_to_window_relative_semantics():
    from epnet_tpu.ops.block_local import to_window_relative

    idx = jnp.asarray([[[10, 300, 40, 500]]], jnp.int32)  # (1, 1, 4)
    starts = jnp.asarray([[8]], jnp.int32)
    rel = np.asarray(to_window_relative(idx, starts, 256))[0, 0]
    # 10->2, 40->32 in-window; 300/500 out -> fall back to min valid rel (2)
    np.testing.assert_array_equal(rel, [2, 2, 32, 2])
    # no in-window member at all -> 0
    idx2 = jnp.asarray([[[300, 500]]], jnp.int32)
    rel2 = np.asarray(to_window_relative(idx2, starts, 256))[0, 0]
    np.testing.assert_array_equal(rel2, [0, 0])
