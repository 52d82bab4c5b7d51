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
