"""grid_sample_points vs torch.nn.functional.grid_sample oracle.

The reference pins torch 1.2 whose grid_sample always used
align_corners=True semantics with zero padding (see
epnet_tpu/ops/grid_sample.py docstring); modern torch reproduces that
with explicit flags.
"""
import numpy as np
import pytest

jnp = pytest.importorskip('jax.numpy')
torch = pytest.importorskip('torch')

from epnet_tpu.ops.grid_sample import grid_sample_points


def _torch_oracle(fm_nhwc, xy_norm):
    fm = torch.from_numpy(np.transpose(fm_nhwc, (0, 3, 1, 2)))  # NCHW
    grid = torch.from_numpy(xy_norm[:, :, None, :])  # (B, N, 1, 2)
    out = torch.nn.functional.grid_sample(
        fm, grid, mode='bilinear', padding_mode='zeros', align_corners=True)
    return out[:, :, :, 0].permute(0, 2, 1).numpy()  # (B, N, C)


@pytest.mark.parametrize('shape', [(2, 12, 40, 5), (1, 3, 3, 2)])
def test_matches_torch_bilinear(shape):
    rng = np.random.RandomState(0)
    B, H, W, C = shape
    fm = rng.randn(B, H, W, C).astype(np.float32)
    # interior, edge, and out-of-bounds sample locations
    xy = rng.uniform(-1.4, 1.4, size=(B, 64, 2)).astype(np.float32)
    xy[:, :8] = np.array([[-1, -1], [1, 1], [-1, 1], [1, -1],
                          [0, 0], [-1.2, 0], [0, 1.2], [2.0, 2.0]],
                         dtype=np.float32)

    got = np.asarray(grid_sample_points(jnp.asarray(fm), jnp.asarray(xy)))
    want = _torch_oracle(fm, xy)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_gradients_flow():
    import jax
    rng = np.random.RandomState(1)
    fm = jnp.asarray(rng.randn(1, 8, 8, 3).astype(np.float32))
    xy = jnp.asarray(rng.uniform(-1, 1, size=(1, 16, 2)).astype(np.float32))
    g = jax.grad(lambda f: jnp.sum(grid_sample_points(f, xy) ** 2))(fm)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.sum(jnp.abs(g))) > 0


def test_custom_vjp_matches_autodiff_oracle():
    """The hand-written backward (flat row scatter-add of the 4 corner
    contributions) must equal autodiff of the plain 4-corner forward."""
    import jax

    rng = np.random.RandomState(7)
    f = jnp.asarray(rng.randn(2, 6, 7, 5), jnp.float32)
    xy = jnp.asarray(rng.uniform(-1.2, 1.2, (2, 11, 2)), jnp.float32)

    def fwd_ref(f_):
        B, H, W, C = f_.shape
        x = (xy[..., 0] + 1.0) * 0.5 * (W - 1)
        y = (xy[..., 1] + 1.0) * 0.5 * (H - 1)
        xs = jnp.clip(jnp.floor(x), 0, W - 2).astype(jnp.int32)
        ys = jnp.clip(jnp.floor(y), 0, H - 2).astype(jnp.int32)
        out = 0
        for i in range(2):
            for j in range(2):
                wy = jnp.maximum(0.0, 1.0 - jnp.abs(y - (ys + i)))
                wx = jnp.maximum(0.0, 1.0 - jnp.abs(x - (xs + j)))
                fm = f_.reshape(B, H * W, C)
                rows = jnp.take_along_axis(
                    fm, ((ys + i) * W + (xs + j))[..., None], axis=1)
                out = out + (wy * wx)[..., None] * rows
        return out

    def loss(f_):
        o = grid_sample_points(f_, xy)
        return jnp.sum(o * jnp.cos(jnp.arange(o.size).reshape(o.shape)))

    def loss_ref(f_):
        o = fwd_ref(f_)
        return jnp.sum(o * jnp.cos(jnp.arange(o.size).reshape(o.shape)))

    np.testing.assert_allclose(np.asarray(jax.grad(loss)(f)),
                               np.asarray(jax.grad(loss_ref)(f)),
                               rtol=1e-5, atol=1e-5)


def test_slot_bwd_matches_flat_bwd():
    """Round-5 slot-factorized dual-packed scatter backward vs the flat
    row-scatter formulation — exact same gradient."""
    import numpy as np

    from epnet_tpu.ops.grid_sample import _gs_bwd_flat, _gs_bwd_slot
    rng = np.random.RandomState(3)
    B, H, W, C, N = 2, 12, 20, 5, 37
    fm = jnp.asarray(rng.randn(0, H, W, C).astype(np.float32))  # proto
    xy = jnp.asarray(rng.uniform(-1.2, 1.2, (B, N, 2)).astype(np.float32))
    g = jnp.asarray(rng.randn(B, N, C).astype(np.float32))
    df_a, _ = _gs_bwd_flat(xy, fm, g)
    df_b, _ = _gs_bwd_slot(xy, fm, g)
    np.testing.assert_allclose(np.asarray(df_a), np.asarray(df_b),
                               rtol=1e-5, atol=1e-5)
