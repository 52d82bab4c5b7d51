"""Train state, jitted train/eval steps, epoch loop, checkpointing.

Replaces the reference's ``tools/train_utils/train_utils.py`` (Trainer
:112-236, checkpoint save/load :58-109). Differences, TPU-first:

  * ``_train_it`` (zero_grad -> forward -> backward -> clip -> step,
    train_utils.py:126-136) becomes ONE jitted, donated XLA program
    containing the whole two-stage model, loss, grad, clip and optimizer —
    no per-iteration host round-trips.
  * checkpoints are orbax pytrees {step, epoch, params, batch_stats,
    opt_state}; ``load_part_ckpt``-style warm start (train_utils.py:93-109)
    is a key-intersection restore (``restore_partial``).
  * BN momentum scheduling is a traced scalar input, not module mutation.
"""

from __future__ import annotations

import functools
import logging
import os
import time
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct
from flax.core import FrozenDict

from ..config import Config
from ..models.epnet import EPNet
from jax.sharding import NamedSharding, PartitionSpec

from ..parallel.mesh import DATA_AXIS, batch_sharding, make_mesh, replicated
from .loss import joint_loss
from .optimizer import make_optimizer
from .schedules import bn_momentum_at


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any


def create_train_state(cfg: Config, rng, sample_batch, total_steps: int,
                       steps_per_epoch: int = 1):
    """Initialize model variables + optimizer. Returns (state, model, tx)."""
    model = EPNet(cfg, mode='TRAIN')
    k1, k2, k3 = jax.random.split(rng, 3)
    # jit the init: eager init would compile every op separately
    init_fn = jax.jit(lambda rngs, b: model.init(rngs, b, train=True))
    variables = init_fn({'params': k1, 'sampling': k2, 'dropout': k3},
                        device_batch(sample_batch))
    tx = make_optimizer(cfg, total_steps, steps_per_epoch)
    params = variables['params']
    state = TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=variables.get('batch_stats', FrozenDict()),
        opt_state=tx.init(params),
    )
    return state, model, tx


def device_batch(batch: Dict) -> Dict:
    """Keep only numeric array fields (drops sample ids, aug bookkeeping)."""
    out = {}
    for k, v in batch.items():
        if k == 'sample_id':
            continue
        if isinstance(v, (np.ndarray, jnp.ndarray)) and v.dtype != object:
            out[k] = v
    return out


def make_train_step(cfg: Config, model: EPNet, tx):
    """One fully-fused train step: forward + loss + grad + clip + update."""

    def step_fn(state: TrainState, batch: Dict, rng, bn_momentum):
        k_samp, k_drop = jax.random.split(jax.random.fold_in(rng, state.step))

        def loss_fn(params):
            out, mutated = model.apply(
                {'params': params, 'batch_stats': state.batch_stats},
                batch, train=True, bn_momentum=bn_momentum,
                mutable=['batch_stats'],
                rngs={'sampling': k_samp, 'dropout': k_drop})
            loss, tb = joint_loss(cfg, out, batch)
            return loss, (tb, mutated['batch_stats'])

        (loss, (tb, new_bs)), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = jax.tree_util.tree_map(lambda p, u: p + u, state.params, updates)
        new_state = state.replace(step=state.step + 1, params=new_params,
                                  batch_stats=new_bs, opt_state=new_opt)
        return new_state, tb

    return step_fn


def jit_train_step(cfg: Config, model: EPNet, tx, mesh=None):
    fn = make_train_step(cfg, model, tx)
    if mesh is None:
        return jax.jit(fn, donate_argnums=(0,))
    rep = replicated(mesh)
    data = batch_sharding(mesh)
    return jax.jit(
        fn, donate_argnums=(0,),
        in_shardings=(rep, data, rep, rep),
        out_shardings=(rep, rep))


def jit_multi_train_step(cfg: Config, model: EPNet, tx, mesh=None):
    """K train steps per dispatch: batches are stacked on a leading axis and
    consumed by an in-graph ``lax.scan``. Amortizes per-dispatch host
    overhead (dominant on the remote platform: ~50% of wall-clock at K=1)
    and keeps the device busy between input waves."""
    step = make_train_step(cfg, model, tx)

    def fn(state: TrainState, batches: Dict, rng, bn_momentum):
        def body(s, batch):
            s, tb = step(s, batch, rng, bn_momentum)
            return s, tb['loss']
        state, losses = jax.lax.scan(body, state, batches)
        return state, {'loss': losses[-1], 'loss_mean': jnp.mean(losses)}

    if mesh is None:
        return jax.jit(fn, donate_argnums=(0,))
    rep = replicated(mesh)
    data = NamedSharding(mesh.mesh if hasattr(mesh, 'mesh') else mesh,
                         PartitionSpec(None, DATA_AXIS))
    return jax.jit(fn, donate_argnums=(0,),
                   in_shardings=(rep, data, rep, rep),
                   out_shardings=(rep, rep))


def make_eval_step(cfg: Config, model_eval: EPNet):
    def step_fn(params, batch_stats, batch):
        return model_eval.apply({'params': params, 'batch_stats': batch_stats},
                                batch, train=False)
    return step_fn


# ---------------------------------------------------------------------------
# Checkpointing (orbax)
# ---------------------------------------------------------------------------

def save_checkpoint(ckpt_dir: str, state: TrainState, epoch: int, keep: int = 30):
    """Save and rotate: keep at most ``keep`` checkpoints, deleting the
    oldest — the reference's max_ckpt_save_num retention
    (train_utils.py:47-55)."""
    import orbax.checkpoint as ocp

    ckpt_dir = os.path.abspath(ckpt_dir)
    os.makedirs(ckpt_dir, exist_ok=True)
    path = os.path.join(ckpt_dir, f'checkpoint_epoch_{epoch}')
    with ocp.StandardCheckpointer() as cp:
        cp.save(path, {'state': jax.device_get(state), 'epoch': epoch}, force=True)
    existing = sorted(
        (d for d in os.listdir(ckpt_dir) if d.startswith('checkpoint_epoch_')
         and d.split('_')[-1].isdigit()),
        key=lambda d: int(d.split('_')[-1]))
    for old in existing[:max(len(existing) - keep, 0)]:
        import shutil
        shutil.rmtree(os.path.join(ckpt_dir, old), ignore_errors=True)
    return path


def load_checkpoint(path: str, state: TrainState):
    """Full resume: model + optimizer + step (train_utils.py:76-90)."""
    import orbax.checkpoint as ocp

    with ocp.StandardCheckpointer() as cp:
        target = {'state': jax.device_get(state), 'epoch': 0}
        restored = cp.restore(os.path.abspath(path), target)
    return restored['state'], restored['epoch']


def _merge_saved(dst, src):
    """Key-intersection copy of ``src`` leaves into the ``dst`` tree."""
    if isinstance(dst, dict):
        out = {}
        for k, v in dst.items():
            if isinstance(src, dict) and k in src:
                out[k] = _merge_saved(v, src[k])
            else:
                out[k] = v
        return out
    if src is not None and np.shape(src) == np.shape(dst):
        return jnp.asarray(src, jnp.asarray(dst).dtype)
    return dst


def restore_partial(path: str, state: TrainState) -> TrainState:
    """Warm start: copy every leaf whose path exists in the checkpoint —
    the reference's state-dict key-intersection load (train_utils.py:93-109),
    used for the two-phase rpn -> rcnn flow."""
    import orbax.checkpoint as ocp

    with ocp.PyTreeCheckpointer() as cp:
        raw = cp.restore(os.path.abspath(path))
    saved = raw['state']

    import flax
    params = _merge_saved(flax.core.unfreeze(state.params),
                          saved.get('params', {}))
    bs = _merge_saved(flax.core.unfreeze(state.batch_stats),
                      saved.get('batch_stats', {}))
    return state.replace(params=params, batch_stats=bs)


def restore_variables(path: str, variables: Dict) -> tuple:
    """Restore {'params', 'batch_stats'} for inference from a full training
    checkpoint (key-intersection, optimizer state ignored). Unlike
    ``load_checkpoint`` this needs no TrainState/optimizer and no TRAIN-mode
    init — eval CLIs restore into a TEST-mode ``model.init`` tree, which the
    label-less test split can build (the TRAIN forward path reads gt boxes).
    Returns (variables, saved_epoch)."""
    import flax
    import orbax.checkpoint as ocp

    with ocp.PyTreeCheckpointer() as cp:
        raw = cp.restore(os.path.abspath(path))
    saved = raw['state']
    out = {
        'params': _merge_saved(flax.core.unfreeze(variables['params']),
                               saved.get('params', {})),
        'batch_stats': _merge_saved(
            flax.core.unfreeze(variables.get('batch_stats', {})),
            saved.get('batch_stats', {})),
    }
    return out, int(raw.get('epoch', 0))


# ---------------------------------------------------------------------------
# Trainer loop
# ---------------------------------------------------------------------------

class Trainer:
    """Epoch loop with per-iteration schedules, logging and checkpointing
    (Trainer, train_utils.py:112-236)."""

    def __init__(self, cfg: Config, model, tx, state: TrainState,
                 ckpt_dir: str = 'output/ckpt', mesh=None,
                 ckpt_save_interval: int = 5, logger=None, tb_log=None,
                 steps_per_call: int = 1, seed: int = 0):
        self.cfg = cfg
        self.seed = seed
        self.model = model
        self.tx = tx
        self.state = state
        self.mesh = mesh
        self.ckpt_dir = ckpt_dir
        self.ckpt_save_interval = ckpt_save_interval
        self.logger = logger or logging.getLogger('epnet_tpu')
        self.tb = tb_log
        self.steps_per_call = steps_per_call
        if steps_per_call > 1:
            self._step_fn = jit_multi_train_step(cfg, model, tx, mesh)
        else:
            self._step_fn = jit_train_step(cfg, model, tx, mesh)
        self._it = 0

    def _dispatch(self, pending, rng, bnm):
        """Run the collected batches in one device call (1 or K steps)."""
        if self.steps_per_call > 1:
            stacked = jax.tree_util.tree_map(
                lambda *xs: np.stack(xs, axis=0), *pending)
            if self.mesh is not None:
                from jax.sharding import NamedSharding, PartitionSpec

                sh = NamedSharding(self.mesh, PartitionSpec(None, DATA_AXIS))
                stacked = jax.tree_util.tree_map(
                    lambda x: jax.device_put(x, sh), stacked)
            self.state, tb = self._step_fn(self.state, stacked, rng,
                                           jnp.float32(bnm))
        else:
            batch = pending[0]
            if self.mesh is not None:
                from ..parallel.mesh import shard_batch
                batch = shard_batch(self.mesh, batch)
            self.state, tb = self._step_fn(self.state, batch, rng,
                                           jnp.float32(bnm))
        self._it += len(pending)
        return tb

    def train(self, start_epoch: int, n_epochs: int, loader, eval_loader=None,
              eval_fn=None):
        # explicit seed (not str.__hash__, which is salted per process via
        # PYTHONHASHSEED): two runs with the same --seed train identically
        rng = jax.random.PRNGKey(self.seed)
        tb = None
        for epoch in range(start_epoch, n_epochs):
            bnm = bn_momentum_at(self.cfg, epoch)
            t0 = time.time()
            n_it = 0
            pending = []
            for batch in loader:
                pending.append(device_batch(batch))
                if len(pending) < self.steps_per_call:
                    continue
                tb = self._dispatch(pending, rng, bnm)
                n_it += len(pending)
                pending = []
                if self.tb is not None and self._it % 10 == 0:
                    for k, v in jax.device_get(tb).items():
                        self.tb.scalar(f'train/{k}', float(v), self._it)
            for b in pending:  # leftover batches run one at a time
                if not hasattr(self, '_single_fn'):
                    self._single_fn = self._step_fn if self.steps_per_call == 1 \
                        else jit_train_step(self.cfg, self.model, self.tx, self.mesh)
                if self.mesh is not None:
                    from ..parallel.mesh import shard_batch
                    b = shard_batch(self.mesh, b)
                self.state, tb = self._single_fn(self.state, b, rng, jnp.float32(bnm))
                self._it += 1
                n_it += 1
            jax.block_until_ready(self.state.params)
            jax.device_get(jax.tree_util.tree_leaves(self.state.step)[0])
            dt = time.time() - t0
            loss = float(jax.device_get(tb['loss'])) \
                if (n_it and tb is not None) else float('nan')
            self.logger.info(
                'epoch %d: %d it in %.1fs (%.2f it/s), loss %.4f, bnm %.4f',
                epoch, n_it, dt, n_it / max(dt, 1e-9), loss, bnm)

            if (epoch % self.ckpt_save_interval == 0 or epoch == n_epochs - 1):
                path = save_checkpoint(self.ckpt_dir, self.state, epoch)
                self.logger.info('saved checkpoint %s', path)
                if eval_fn is not None and eval_loader is not None:
                    eval_fn(self.state, eval_loader, epoch)
        return self.state
