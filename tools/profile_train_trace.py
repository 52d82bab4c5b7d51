import os, sys, glob, gzip, json, collections
sys.path.insert(0, os.getcwd())
import numpy as np, jax, jax.numpy as jnp
from __graft_entry__ import _full_batch, _full_config
from epnet_tpu.train.trainer import create_train_state, jit_train_step, device_batch

cfg = _full_config()
B = 4
batch = _full_batch(cfg, batch_size=B, seed=0)
rng = np.random.RandomState(1)
N = cfg.RPN.NUM_POINTS
G = 20
batch['gt_boxes3d'] = np.stack([rng.uniform(-30,30,(B,G)), rng.uniform(0.8,1.6,(B,G)), rng.uniform(5,60,(B,G)), rng.uniform(1.4,1.7,(B,G)), rng.uniform(1.5,1.7,(B,G)), rng.uniform(3.5,4.2,(B,G)), rng.uniform(-np.pi,np.pi,(B,G))], -1).astype(np.float32)
batch['rpn_cls_label'] = (rng.rand(B,N)>0.95).astype(np.int32)
reg = np.zeros((B,N,7), np.float32); reg[...,3:6]=1.5
batch['rpn_reg_label'] = reg

state, model, tx = create_train_state(cfg, jax.random.PRNGKey(0), batch, total_steps=100)
step = jit_train_step(cfg, model, tx)
db = jax.device_put(device_batch(batch))
key = jax.random.PRNGKey(0)
state, tb = step(state, db, key, jnp.float32(0.1))
np.asarray(tb['loss'])
jax.profiler.start_trace('/root/repo/output/trace_train')
for _ in range(2):
    state, tb = step(state, db, key, jnp.float32(0.1))
    np.asarray(tb['loss'])
jax.profiler.stop_trace()
f = sorted(glob.glob('/root/repo/output/trace_train/plugins/profile/*/vm.trace.json.gz'))[-1]
with gzip.open(f) as fh:
    data = json.load(fh)
durs = collections.Counter()
pid_names = {}
for e in data['traceEvents']:
    if e.get('ph') == 'M' and e.get('name') == 'process_name':
        pid_names[e['pid']] = e['args'].get('name','')
for e in data['traceEvents']:
    if e.get('ph') == 'X' and 'dur' in e and 'TPU' in pid_names.get(e.get('pid'),''):
        durs[e['name']] += e['dur']
for name, d in durs.most_common(25):
    print(f'{d/2000:8.1f} ms  {name[:100]}')
