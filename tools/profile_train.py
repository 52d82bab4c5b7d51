"""Full-scale train-step timing on the real chip."""
import sys, os, time
sys.path.insert(0, os.getcwd())
import numpy as np, jax, jax.numpy as jnp

from __graft_entry__ import _full_batch, _full_config
from epnet_tpu.train.trainer import create_train_state, jit_train_step, device_batch

cfg = _full_config()
import sys
if '--no-dropout' in sys.argv:
    cfg = cfg.merged({'RPN': {'DP_RATIO': -1.0}, 'RCNN': {'DP_RATIO': -1.0}})
    print('dropout disabled', flush=True)
B = int(os.environ.get('EPNET_PROFILE_B', '4'))
batch = _full_batch(cfg, batch_size=B, seed=0)
# add labels
rng = np.random.RandomState(1)
N = cfg.RPN.NUM_POINTS
G = 20
gt = np.stack([rng.uniform(-30, 30, (B, G)), rng.uniform(0.8, 1.6, (B, G)),
               rng.uniform(5, 60, (B, G)), rng.uniform(1.4, 1.7, (B, G)),
               rng.uniform(1.5, 1.7, (B, G)), rng.uniform(3.5, 4.2, (B, G)),
               rng.uniform(-np.pi, np.pi, (B, G))], axis=-1).astype(np.float32)
batch['gt_boxes3d'] = gt
batch['rpn_cls_label'] = (rng.rand(B, N) > 0.95).astype(np.int32)
reg = np.zeros((B, N, 7), np.float32); reg[..., 3:6] = 1.5
batch['rpn_reg_label'] = reg

t0 = time.time()
state, model, tx = create_train_state(cfg, jax.random.PRNGKey(0), batch, total_steps=100)
print('init done', round(time.time()-t0, 1), 's', flush=True)

step = jit_train_step(cfg, model, tx)
db = jax.device_put(device_batch(batch))
key = jax.random.PRNGKey(0)
t0 = time.time()
state, tb = step(state, db, key, jnp.float32(0.1))
print('first step (compile):', round(time.time()-t0, 1), 's  loss', float(np.asarray(tb['loss'])), flush=True)
t0 = time.time()
n = 5
for _ in range(n):
    state, tb = step(state, db, key, jnp.float32(0.1))
    np.asarray(tb['loss'])
dt = (time.time()-t0)/n
print(f'train step: {dt*1000:.0f} ms/batch -> {B/dt:.2f} scans/sec', flush=True)

# multi-step dispatch timing
from epnet_tpu.train.trainer import jit_multi_train_step
K = 4
multi = jit_multi_train_step(cfg, model, tx)
stacked = jax.tree_util.tree_map(lambda x: np.stack([x]*K, 0), device_batch(batch))
sd = jax.device_put(stacked)
state2, tb2 = multi(state, sd, key, jnp.float32(0.1))
np.asarray(tb2['loss'])
t0 = time.time()
n = 3
for _ in range(n):
    state2, tb2 = multi(state2, sd, key, jnp.float32(0.1))
    np.asarray(tb2['loss'])
dt = (time.time()-t0)/n
print(f'multi-step (K={K}) train: {dt/K*1000:.0f} ms/step -> {B*K/dt:.2f} scans/sec', flush=True)
