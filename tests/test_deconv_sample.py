"""Differential tests for ops/deconv_sample.deconv_bn_relu_sample.

The oracle is a dense composition built independently here: per-scale
depth-to-space deconv -> sum + bias -> train-mode BatchNorm -> ReLU ->
align-corners bilinear sampling — and JAX autodiff through it. The fused
op must match value and every gradient (f32, CPU).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from epnet_tpu.ops.deconv_sample import deconv_bn_relu_sample

EPS = 1e-5


def dense_reference(xs, cws, bias_fused, scale, bias, xy_norm, ks):
    F = scale.shape[0]
    B = xs[0].shape[0]
    H = xs[0].shape[1] * ks[0]
    W = xs[0].shape[2] * ks[0]
    total = jnp.zeros((B, H, W, F), xs[0].dtype)
    for x, cw, k in zip(xs, cws, ks):
        b, h, w, _ = x.shape
        y = (x @ cw).reshape(b, h, w, k, k, F)
        y = y.transpose(0, 1, 3, 2, 4, 5).reshape(b, h * k, w * k, F)
        total = total + y
    total = total + bias_fused

    red = (0, 1, 2)
    mean = jnp.mean(total, axis=red)
    var = jnp.mean(jnp.square(total - mean), axis=red)
    z = (total - mean) * jax.lax.rsqrt(var + EPS) * scale + bias
    z = jnp.maximum(z, 0)

    x = (xy_norm[..., 0] + 1.0) * 0.5 * (W - 1)
    y = (xy_norm[..., 1] + 1.0) * 0.5 * (H - 1)
    x0 = jnp.clip(jnp.floor(x), 0, W - 2).astype(jnp.int32)
    y0 = jnp.clip(jnp.floor(y), 0, H - 2).astype(jnp.int32)
    out = 0.0
    zf = z.reshape(B, H * W, F)
    for dy in range(2):
        for dx in range(2):
            wy = jnp.maximum(0.0, 1.0 - jnp.abs(y - (y0 + dy)))
            wx = jnp.maximum(0.0, 1.0 - jnp.abs(x - (x0 + dx)))
            rows = (y0 + dy) * W + (x0 + dx)
            vals = jnp.take_along_axis(zf, rows[..., None], axis=1)
            out = out + (wy * wx)[..., None] * vals
    M = B * H * W
    return out, mean, var * (M / (M - 1))


def make_inputs(seed=0, B=2, H=32, W=48, F=8, N=64):
    rng = np.random.RandomState(seed)
    ks = (2, 4, 8, 16)
    Cs = (16, 24, 32, 40)
    xs = tuple(jnp.asarray(rng.randn(B, H // k, W // k, C).astype(np.float32))
               for k, C in zip(ks, Cs))
    cws = tuple(jnp.asarray(
        (rng.randn(C, k * k * F) / np.sqrt(C)).astype(np.float32))
        for k, C in zip(ks, Cs))
    bias_fused = jnp.asarray(rng.randn(F).astype(np.float32)) * 0.1
    scale = jnp.asarray(1.0 + 0.2 * rng.randn(F).astype(np.float32))
    bias = jnp.asarray(0.1 * rng.randn(F).astype(np.float32))
    xy = jnp.asarray(rng.uniform(-0.99, 0.99, (B, N, 2)).astype(np.float32))
    return xs, cws, bias_fused, scale, bias, xy, ks


def test_forward_matches_dense():
    xs, cws, bias_fused, scale, bias, xy, ks = make_inputs()
    pts, mean, var_u = deconv_bn_relu_sample(
        xs, cws, bias_fused, scale, bias, xy, ks, EPS)
    ref, mean_r, var_r = dense_reference(
        xs, cws, bias_fused, scale, bias, xy, ks)
    np.testing.assert_allclose(np.asarray(mean), np.asarray(mean_r),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(var_u), np.asarray(var_r),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(pts), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize('seed', [0, 3])
def test_grads_match_dense_autodiff(seed):
    xs, cws, bias_fused, scale, bias, xy, ks = make_inputs(seed)
    # random fixed cotangent so every output position matters
    rng = np.random.RandomState(100 + seed)
    ct = jnp.asarray(rng.randn(*(xy.shape[:2] + (scale.shape[0],)))
                     .astype(np.float32))

    def loss_fused(xs, cws, bias_fused, scale, bias):
        pts, _, _ = deconv_bn_relu_sample(
            xs, cws, bias_fused, scale, bias, xy, ks, EPS)
        return jnp.sum(pts * ct)

    def loss_dense(xs, cws, bias_fused, scale, bias):
        pts, _, _ = dense_reference(xs, cws, bias_fused, scale, bias, xy, ks)
        return jnp.sum(pts * ct)

    gf = jax.grad(loss_fused, argnums=(0, 1, 2, 3, 4))(
        xs, cws, bias_fused, scale, bias)
    gd = jax.grad(loss_dense, argnums=(0, 1, 2, 3, 4))(
        xs, cws, bias_fused, scale, bias)
    labels = ['xs', 'cws', 'bias_fused', 'scale', 'bias']
    for lab, a, b in zip(labels, gf, gd):
        fa = jax.tree_util.tree_leaves(a)
        fb = jax.tree_util.tree_leaves(b)
        for x, y in zip(fa, fb):
            np.testing.assert_allclose(
                np.asarray(x), np.asarray(y), rtol=2e-3, atol=2e-4,
                err_msg=f'grad mismatch in {lab}')


def test_stats_get_no_gradient_path():
    xs, cws, bias_fused, scale, bias, xy, ks = make_inputs(1)

    def f(scale):
        pts, mean, var = deconv_bn_relu_sample(
            xs, cws, bias_fused, scale, bias, xy, ks, EPS)
        # consuming the stats must not crash the custom bwd
        return jnp.sum(pts) + 0.0 * (jnp.sum(mean) + jnp.sum(var))

    g = jax.grad(f)(scale)
    assert np.all(np.isfinite(np.asarray(g)))


class TestModuleIntegration:
    """DeconvFusionHead fused path vs its dense path (EPNET_FUSED_HEAD=0)."""

    def _setup(self):
        import os

        from epnet_tpu.models.fusion import DeconvFusionHead
        rng = np.random.RandomState(7)
        B, F, N = 2, 8, 96
        ks = (2, 4, 8, 16)
        Cs = (16, 24, 32, 40)
        H, W = 32, 64
        imgs = [jnp.asarray(rng.randn(B, H // k, W // k, C).astype(np.float32))
                for k, C in zip(ks, Cs)]
        xy = jnp.asarray(rng.uniform(-0.99, 0.99, (B, N, 2)).astype(np.float32))
        head = DeconvFusionHead(reduce=(4, 4, 4, 4), kernels=ks, features=F)
        variables = head.init({'params': jax.random.PRNGKey(0)}, imgs,
                              train=False)
        return os, head, variables, imgs, xy

    def _run(self, os, head, variables, imgs, xy, fused):
        os.environ['EPNET_FUSED_HEAD'] = '1' if fused else '0'
        try:
            def loss(params):
                out, upd = head.apply(
                    {'params': params,
                     'batch_stats': variables.get('batch_stats', {})},
                    imgs, train=True, bn_momentum=0.1, xy=xy,
                    mutable=['batch_stats'])
                return jnp.sum(out ** 2), (out, upd)

            (val, (out, upd)), grads = jax.value_and_grad(
                loss, has_aux=True)(variables['params'])
            return val, out, upd, grads
        finally:
            os.environ.pop('EPNET_FUSED_HEAD', None)

    def test_fused_eval_matches_dense_eval(self):
        """Round-5 eval path (deconv_bn_relu_sample_eval: running-stat BN,
        no full-res map) vs the dense eval path, nontrivial running stats."""
        os, head, variables, imgs, xy = self._setup()
        # push non-default running stats through one train-mode update
        _, _, upd, _ = self._run(os, head, variables, imgs, xy, fused=False)
        stats = upd['batch_stats']

        def run_eval(fused_eval):
            os.environ['EPNET_FUSED_HEAD_EVAL'] = '1' if fused_eval else '0'
            try:
                return head.apply(
                    {'params': variables['params'], 'batch_stats': stats},
                    imgs, train=False, xy=xy)
            finally:
                os.environ.pop('EPNET_FUSED_HEAD_EVAL', None)

        o_fused = run_eval(True)
        o_dense = run_eval(False)
        np.testing.assert_allclose(np.asarray(o_fused), np.asarray(o_dense),
                                   rtol=1e-4, atol=1e-4)

    def test_fused_matches_dense_path(self):
        os, head, variables, imgs, xy = self._setup()
        v1, o1, u1, g1 = self._run(os, head, variables, imgs, xy, fused=True)
        v2, o2, u2, g2 = self._run(os, head, variables, imgs, xy, fused=False)
        np.testing.assert_allclose(np.asarray(o1), np.asarray(o2),
                                   rtol=1e-4, atol=1e-4)
        for a, b in zip(jax.tree_util.tree_leaves(u1),
                        jax.tree_util.tree_leaves(u2)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-5)
        fa = jax.tree_util.tree_leaves_with_path(g1)
        fb = jax.tree_util.tree_leaves(g2)
        for (path, a), b in zip(fa, fb):
            pstr = jax.tree_util.keystr(path)
            if 'deconv' in pstr and 'bias' in pstr:
                # a bias feeding straight into BN has mathematically zero
                # gradient (any shift is absorbed by the batch mean); both
                # paths emit fp noise around 0, which cannot agree in
                # relative terms — assert both are noise-small instead.
                assert np.max(np.abs(np.asarray(a))) < 1e-2, pstr
                assert np.max(np.abs(np.asarray(b))) < 1e-2, pstr
                continue
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=2e-3, atol=2e-4,
                err_msg=f'param grad mismatch at {pstr}')
