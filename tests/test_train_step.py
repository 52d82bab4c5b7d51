"""End-to-end train step: loss computes, decreases, and runs sharded on a
multi-device CPU mesh — the multi-device fixture the reference never had
(SURVEY.md §4.5)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from epnet_tpu.parallel.mesh import make_mesh, shard_batch, replicate_state
from epnet_tpu.train.schedules import bn_momentum_at, one_cycle_lr, one_cycle_mom
from epnet_tpu.train.trainer import create_train_state, jit_train_step

from tiny import synthetic_batch, tiny_config


@pytest.fixture(scope='module')
def setup():
    cfg = tiny_config()
    rng = np.random.RandomState(9)
    batch = synthetic_batch(rng, cfg, batch=2)
    state, model, tx = create_train_state(cfg, jax.random.PRNGKey(0), batch,
                                          total_steps=100)
    return cfg, batch, state, model, tx


def _copy(state):
    return jax.tree_util.tree_map(jnp.copy, state)  # steps donate their input


def test_train_step_runs_and_loss_decreases(setup):
    cfg, batch, state, model, tx = setup
    state = _copy(state)
    step = jit_train_step(cfg, model, tx)
    rng = jax.random.PRNGKey(42)
    losses = []
    for i in range(6):
        state, tb = step(state, batch, rng, jnp.float32(0.1))
        losses.append(float(tb['loss']))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0], losses  # same batch: loss must drop


def test_train_step_multichip_mesh(setup):
    cfg, batch, state, model, tx = setup
    assert len(jax.devices()) == 8, 'conftest should fake 8 CPU devices'
    mesh = make_mesh(8)
    # batch of 8 so the data axis shards evenly
    rng_np = np.random.RandomState(1)
    batch8 = synthetic_batch(rng_np, cfg, batch=8)
    state = replicate_state(mesh, _copy(state))
    step = jit_train_step(cfg, model, tx, mesh=mesh)
    sharded = shard_batch(mesh, batch8)
    state2, tb = step(state, sharded, jax.random.PRNGKey(0), jnp.float32(0.1))
    assert np.isfinite(float(tb['loss']))
    # params stay replicated
    leaf = jax.tree_util.tree_leaves(state2.params)[0]
    assert leaf.sharding.is_fully_replicated


def test_onecycle_schedule_shape():
    lr = one_cycle_lr(100, 0.002, 10.0, 0.4)
    mom = one_cycle_mom(100, (0.95, 0.85), 0.4)
    assert abs(float(lr(0)) - 0.0002) < 1e-7
    assert abs(float(lr(40)) - 0.002) < 1e-5
    assert float(lr(99)) < 0.0002
    assert abs(float(mom(0)) - 0.95) < 1e-6
    assert abs(float(mom(40)) - 0.85) < 1e-3
    assert abs(float(mom(99)) - 0.95) < 2e-2


def test_bn_momentum_schedule():
    cfg = tiny_config(TRAIN={'BN_MOMENTUM': 0.1, 'BN_DECAY': 0.5,
                             'BNM_CLIP': 0.01, 'BN_DECAY_STEP_LIST': (10, 20)})
    assert bn_momentum_at(cfg, 0) == 0.1
    assert bn_momentum_at(cfg, 10) == 0.05
    assert bn_momentum_at(cfg, 25) == 0.025
    cfg2 = tiny_config(TRAIN={'BN_MOMENTUM': 0.1, 'BN_DECAY': 0.5,
                              'BNM_CLIP': 0.01,
                              'BN_DECAY_STEP_LIST': (1, 2, 3, 4, 5)})
    assert bn_momentum_at(cfg2, 100) == 0.01  # floored at BNM_CLIP


def test_multi_step_dispatch(setup):
    from epnet_tpu.train.trainer import jit_multi_train_step

    cfg, batch, state, model, tx = setup
    state = _copy(state)
    multi = jit_multi_train_step(cfg, model, tx)
    stacked = jax.tree_util.tree_map(lambda x: np.stack([x, x], axis=0), batch)
    state2, tb = multi(state, stacked, jax.random.PRNGKey(0), jnp.float32(0.1))
    assert np.isfinite(float(tb['loss'])) and np.isfinite(float(tb['loss_mean']))
    assert int(state2.step) == 2  # two optimizer steps applied
