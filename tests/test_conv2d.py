"""ops/conv2d.conv3x3_stride2: value and gradients vs lax autodiff."""
import jax
import jax.numpy as jnp
import numpy as np

from epnet_tpu.ops.conv2d import conv3x3_stride2


def _lax_conv(x, w):
    return jax.lax.conv_general_dilated(
        x, w, (2, 2), 'SAME', dimension_numbers=('NHWC', 'HWIO', 'NHWC'))


def test_value_and_grads_match_lax():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 16, 24, 5).astype(np.float32))
    w = jnp.asarray((rng.randn(3, 3, 5, 7) / 10).astype(np.float32))
    ct = jnp.asarray(rng.randn(2, 8, 12, 7).astype(np.float32))

    np.testing.assert_allclose(np.asarray(conv3x3_stride2(x, w)),
                               np.asarray(_lax_conv(x, w)),
                               rtol=1e-5, atol=1e-5)

    gx1, gw1 = jax.grad(lambda x, w: jnp.sum(conv3x3_stride2(x, w) * ct),
                        argnums=(0, 1))(x, w)
    gx2, gw2 = jax.grad(lambda x, w: jnp.sum(_lax_conv(x, w) * ct),
                        argnums=(0, 1))(x, w)
    np.testing.assert_allclose(np.asarray(gx1), np.asarray(gx2),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gw1), np.asarray(gw2),
                               rtol=1e-4, atol=1e-4)


def test_stride1_value_and_grads_match_lax():
    from epnet_tpu.ops.conv2d import conv3x3_same
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(2, 15, 23, 5).astype(np.float32))  # odd H, W
    w = jnp.asarray((rng.randn(3, 3, 5, 7) / 10).astype(np.float32))
    ct = jnp.asarray(rng.randn(2, 15, 23, 7).astype(np.float32))

    def _lax_s1(x, w):
        return jax.lax.conv_general_dilated(
            x, w, (1, 1), 'SAME', dimension_numbers=('NHWC', 'HWIO', 'NHWC'))

    np.testing.assert_allclose(np.asarray(conv3x3_same(x, w, 1)),
                               np.asarray(_lax_s1(x, w)),
                               rtol=1e-5, atol=1e-5)
    gx1, gw1 = jax.grad(lambda x, w: jnp.sum(conv3x3_same(x, w, 1) * ct),
                        argnums=(0, 1))(x, w)
    gx2, gw2 = jax.grad(lambda x, w: jnp.sum(_lax_s1(x, w) * ct),
                        argnums=(0, 1))(x, w)
    np.testing.assert_allclose(np.asarray(gx1), np.asarray(gx2),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gw1), np.asarray(gw2),
                               rtol=1e-4, atol=1e-4)


def test_conv2dblock_param_path_unchanged():
    from epnet_tpu.models.layers import Conv2dBlock
    x = jnp.zeros((1, 8, 12, 4))
    blk = Conv2dBlock(6, kernel=3, stride=2)
    v = blk.init({'params': jax.random.PRNGKey(0)}, x)
    assert 'Conv_0' in v['params'] and 'kernel' in v['params']['Conv_0']
    assert v['params']['Conv_0']['kernel'].shape == (3, 3, 4, 6)


def test_shipped_forward_is_lax():
    # Round-4 resolution of the forward question: both replacement
    # forwards LOSE on-chip (the Pallas row-tile kernel exceeds scoped
    # VMEM at compile; space-to-depth is slower at every tower shape —
    # see tools/conv_fwd_attic.py for the kernels + measurements), so the
    # shipped primal must be XLA's own conv, with the custom part
    # backward-only.
    from epnet_tpu.ops import conv2d
    x = jnp.zeros((1, 8, 12, 4))
    w = jnp.zeros((3, 3, 4, 6))
    assert np.asarray(conv2d._conv_fwd(x, w, 2)).shape == (1, 4, 6, 6)
    jaxpr = str(jax.make_jaxpr(lambda x, w: conv2d._conv_fwd(x, w, 2))(x, w))
    assert 'pallas_call' not in jaxpr and 'custom_call' not in jaxpr


def test_stem_im2col_value_and_dw_match_lax():
    # the RGB stem ships on the im2col dot (Conv2dBlock dispatch via
    # stem_im2col_available); values and the weight grad must match lax
    from epnet_tpu.ops.conv2d import conv3x3_s1_im2col
    rng = np.random.RandomState(4)
    x = jnp.asarray(rng.randn(2, 10, 14, 3).astype(np.float32))
    w = jnp.asarray((rng.randn(3, 3, 3, 8) / 10).astype(np.float32))

    def _lax_s1(x, w):
        return jax.lax.conv_general_dilated(
            x, w, (1, 1), 'SAME', dimension_numbers=('NHWC', 'HWIO', 'NHWC'))

    ref = _lax_s1(x, w)
    np.testing.assert_allclose(np.asarray(conv3x3_s1_im2col(x, w)),
                               np.asarray(ref), rtol=2e-5, atol=2e-5)
    ct = jnp.asarray(rng.randn(*ref.shape).astype(np.float32))
    g1 = jax.grad(lambda w: jnp.sum(conv3x3_s1_im2col(x, w) * ct))(w)
    g2 = jax.grad(lambda w: jnp.sum(_lax_s1(x, w) * ct))(w)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               rtol=1e-4, atol=1e-4)

    from epnet_tpu.models.layers import Conv2dBlock
    blk = Conv2dBlock(6, kernel=3, stride=1, bn=True, activation=True)
    v = blk.init({'params': jax.random.PRNGKey(0)}, jnp.zeros((1, 8, 12, 3)))
    assert v['params']['Conv_0']['kernel'].shape == (3, 3, 3, 6)


def test_phase_s2_backward_matches_lax():
    # phase-decomposed s2 pulls (no lhs/rhs dilation — ops/conv2d.py
    # _dx_phase_s2/_dw_phase_s2) must match XLA's vjp exactly
    from epnet_tpu.ops.conv2d import _dx_phase_s2, _dw_phase_s2
    rng = np.random.RandomState(5)
    for B, H, W, C, F in [(2, 8, 12, 5, 7), (1, 16, 24, 3, 4)]:
        x = jnp.asarray(rng.randn(B, H, W, C).astype(np.float32))
        w = jnp.asarray((rng.randn(3, 3, C, F) / 10).astype(np.float32))
        dy = jnp.asarray(rng.randn(B, H // 2, W // 2, F).astype(np.float32))
        _, pull = jax.vjp(lambda x, w: _lax_conv(x, w), x, w)
        dx_ref, dw_ref = pull(dy)
        np.testing.assert_allclose(np.asarray(_dx_phase_s2(dy, w)),
                                   np.asarray(dx_ref), rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(_dw_phase_s2(x, dy, w.dtype)),
                                   np.asarray(dw_ref), rtol=1e-5, atol=1e-5)


def test_dw_pallas_kernel_interpret():
    from epnet_tpu.ops.conv2d import _dw_pallas
    rng = np.random.RandomState(2)
    B, H, W, C, F = 2, 32, 48, 8, 16
    x = jnp.asarray(rng.randn(B, H, W, C).astype(np.float32))
    w = jnp.asarray((rng.randn(3, 3, C, F) / 10).astype(np.float32))
    ct = jnp.asarray(rng.randn(B, H // 2, W // 2, F).astype(np.float32))

    dw_ref = jax.grad(lambda w: jnp.sum(_lax_conv(x, w) * ct))(w)
    dw = _dw_pallas(x, ct, F, tm=8, interpret=True)
    np.testing.assert_allclose(np.asarray(dw), np.asarray(dw_ref),
                               rtol=1e-4, atol=1e-4)
