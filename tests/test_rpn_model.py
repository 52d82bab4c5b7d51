"""RPN + proposal layer smoke/shape tests on a tiny config."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from epnet_tpu.models.proposal import ProposalLayer
from epnet_tpu.models.rpn import RPN

from tiny import synthetic_batch, tiny_config


@pytest.fixture(scope='module')
def setup():
    cfg = tiny_config()
    rng = np.random.RandomState(3)
    batch = synthetic_batch(rng, cfg, batch=2)
    model = RPN(cfg)
    variables = model.init(
        jax.random.PRNGKey(0), batch['pts_input'],
        image=batch['img'], xy=batch['pts_origin_xy'], train=False)
    return cfg, batch, model, variables


def test_rpn_forward_shapes(setup):
    cfg, batch, model, variables = setup
    out = model.apply(variables, batch['pts_input'], image=batch['img'],
                      xy=batch['pts_origin_xy'], train=False)
    B, N = batch['pts_input'].shape[:2]
    assert out['rpn_cls'].shape == (B, N, 1)
    assert out['rpn_reg'].shape == (B, N, cfg.RPN.reg_channel)
    assert out['backbone_xyz'].shape == (B, N, 3)
    assert out['backbone_features'].shape == (B, N, cfg.RPN.FP_MLPS[0][-1])
    assert np.isfinite(np.asarray(out['rpn_cls'])).all()
    assert np.isfinite(np.asarray(out['rpn_reg'])).all()


def test_rpn_focal_bias_init(setup):
    _, _, _, variables = setup
    b = np.asarray(variables['params']['cls_out']['bias'])
    assert abs(b[0] - (-np.log(0.99 / 0.01))) < 1e-4


def test_rpn_train_mode_updates_bn(setup):
    cfg, batch, model, variables = setup
    out, mutated = model.apply(
        variables, batch['pts_input'], image=batch['img'], xy=batch['pts_origin_xy'],
        train=True, bn_momentum=0.1, mutable=['batch_stats'],
        rngs={'dropout': jax.random.PRNGKey(1)})
    old = jax.tree_util.tree_leaves(variables['batch_stats'])
    new = jax.tree_util.tree_leaves(mutated['batch_stats'])
    assert any(not np.allclose(a, b) for a, b in zip(old, new))


def test_proposal_layer_shapes(setup):
    cfg, batch, model, variables = setup
    out = model.apply(variables, batch['pts_input'], image=batch['img'],
                      xy=batch['pts_origin_xy'], train=False)
    player = ProposalLayer(cfg, mode='TRAIN')
    rois, scores, counts = player(out['rpn_cls'][..., 0], out['rpn_reg'], out['backbone_xyz'])
    B = batch['pts_input'].shape[0]
    post = cfg.TRAIN.RPN_POST_NMS_TOP_N
    assert rois.shape == (B, post, 7)
    assert scores.shape == (B, post)
    counts = np.asarray(counts)
    assert (counts > 0).all() and (counts <= post).all()
    rois = np.asarray(rois)
    # valid rois have positive sizes; padding is zero
    for b in range(B):
        c = counts[b]
        assert (rois[b, :c, 3:6] > 0).all()
        assert (rois[b, c:] == 0).all()


def test_rpn_gradients_flow(setup):
    cfg, batch, model, variables = setup

    def loss_fn(params):
        out = model.apply({'params': params, 'batch_stats': variables['batch_stats']},
                          batch['pts_input'], image=batch['img'],
                          xy=batch['pts_origin_xy'], train=False)
        return jnp.mean(out['rpn_cls'] ** 2) + jnp.mean(out['rpn_reg'] ** 2)

    g = jax.grad(loss_fn)(variables['params'])
    flat = jax.tree_util.tree_leaves(g)
    assert all(np.isfinite(np.asarray(x)).all() for x in flat)
    nonzero = sum(float(np.abs(np.asarray(x)).sum()) > 0 for x in flat)
    assert nonzero > len(flat) * 0.7  # most params receive gradient


def test_deconv_fusion_head_matches_unfused():
    """DeconvFusionHead == DeConvUp x4 -> concat -> 1x1 -> BN -> relu built
    from the same parameters (the folded form is mathematically identical;
    pointnet2_msg.py:170-172,239-246)."""
    from epnet_tpu.models.fusion import DeConvUp, DeconvFusionHead
    from epnet_tpu.models.layers import BatchNorm
    from flax import linen as nn

    reduce, kernels, F = (4, 4, 4, 4), (2, 4, 8, 16), 8
    chans = (6, 7, 8, 9)
    H, W = 32, 48
    key = jax.random.PRNGKey(0)
    imgs = [jax.random.normal(jax.random.fold_in(key, i),
                              (2, H // k, W // k, c))
            for i, (k, c) in enumerate(zip(kernels, chans))]

    head = DeconvFusionHead(reduce=reduce, kernels=kernels, features=F)
    params = head.init(jax.random.PRNGKey(1), imgs)
    got = head.apply(params, imgs)

    p = params['params']
    ups, off = [], 0
    for i, (k, r) in enumerate(zip(kernels, reduce)):
        up = DeConvUp(r, k)
        y = up.apply({'params': {'kernel': p[f'deconv{i}_kernel'],
                                 'bias': p[f'deconv{i}_bias']}}, imgs[i])
        ups.append(y)
    cat = jnp.concatenate(ups, axis=-1)
    dense = cat @ p['fusion_kernel']
    bn = BatchNorm()
    want = nn.relu(bn.apply(
        {'params': params['params']['image_fusion_bn'],
         'batch_stats': params['batch_stats']['image_fusion_bn']},
        dense, train=False))

    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)
