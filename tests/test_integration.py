"""End-to-end integration: real data pipeline -> jitted train steps ->
joint eval with KITTI-format output and AP — on the synthetic on-disk
KITTI set with a tiny config (the reference's only 'test' was exactly this
loop at full scale, SURVEY.md §4.1)."""

import glob
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from epnet_tpu.data import DataLoader, KittiRCNNDataset
from epnet_tpu.eval.detect import evaluate_joint
from epnet_tpu.train.trainer import (create_train_state, device_batch,
                                     jit_train_step, load_checkpoint,
                                     restore_partial, save_checkpoint)
from epnet_tpu.utils.testing import make_fake_kitti

from tiny import tiny_config


@pytest.fixture(scope='module')
def env(tmp_path_factory):
    root = tmp_path_factory.mktemp('kitti_e2e')
    make_fake_kitti(str(root), n_samples=4)
    cfg = tiny_config()
    np.random.seed(0)
    train_ds = KittiRCNNDataset(str(root), cfg, npoints=cfg.RPN.NUM_POINTS,
                                split='train', classes='Car', mode='TRAIN',
                                max_gt=8)
    loader = DataLoader(train_ds, batch_size=2, shuffle=True, num_workers=0)
    batch = next(iter(loader))
    state, model, tx = create_train_state(cfg, jax.random.PRNGKey(0), batch,
                                          total_steps=20)
    return root, cfg, train_ds, loader, state, model, tx


def test_train_steps_on_real_pipeline(env):
    root, cfg, ds, loader, state, model, tx = env
    step = jit_train_step(cfg, model, tx)
    state = jax.tree_util.tree_map(jnp.copy, state)
    rng = jax.random.PRNGKey(7)
    losses = []
    for epoch in range(2):
        for batch in loader:
            state, tb = step(state, device_batch(batch), rng, jnp.float32(0.1))
            losses.append(float(tb['loss']))
    assert all(np.isfinite(losses)), losses
    env_state_holder.append(state)  # reuse trained state in later tests


env_state_holder = []


def test_checkpoint_roundtrip(env, tmp_path):
    root, cfg, ds, loader, state, model, tx = env
    trained = env_state_holder[0]
    path = save_checkpoint(str(tmp_path / 'ckpt'), trained, epoch=2)
    fresh = jax.tree_util.tree_map(jnp.copy, state)
    restored, epoch = load_checkpoint(path, fresh)
    assert epoch == 2
    a = jax.tree_util.tree_leaves(trained.params)[0]
    b = jax.tree_util.tree_leaves(restored.params)[0]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b))

    # partial (warm-start) restore keeps matching keys only
    partial = restore_partial(path, jax.tree_util.tree_map(jnp.copy, state))
    c = jax.tree_util.tree_leaves(partial.params)[0]
    np.testing.assert_allclose(np.asarray(a), np.asarray(c))


def test_joint_eval_end_to_end(env, tmp_path):
    root, cfg, ds, loader, state, model, tx = env
    trained = env_state_holder[0]
    eval_ds = KittiRCNNDataset(str(root), cfg, npoints=cfg.RPN.NUM_POINTS,
                               split='val', classes='Car', mode='EVAL', max_gt=8)
    eval_loader = DataLoader(eval_ds, batch_size=2, shuffle=False, num_workers=0)
    variables = {'params': trained.params, 'batch_stats': trained.batch_stats}
    ret = evaluate_joint(cfg, variables, eval_ds, eval_loader,
                         str(tmp_path / 'results'), run_ap=True)
    # outputs exist in KITTI format
    files = glob.glob(str(tmp_path / 'results' / 'final_result' / 'data' / '*.txt'))
    assert len(files) == 4
    assert 'rcnn_recall(thresh=0.50)' in ret
    assert 'ap' in ret and 'Car' in ret['ap']
    # an untrained tiny model should still produce finite recall numbers
    assert np.isfinite(ret['rpn_iou'])
