import os, sys, glob, gzip, json, collections
sys.path.insert(0, os.getcwd())
import numpy as np, jax, jax.numpy as jnp
from __graft_entry__ import _full_batch, _full_config
from epnet_tpu.models.epnet import EPNet
cfg = _full_config()
batch = _full_batch(cfg, batch_size=8)
model = EPNet(cfg, mode='TEST')
init = jax.jit(lambda r, b: model.init(r, b, train=False))
variables = init({'params': jax.random.PRNGKey(0), 'sampling': jax.random.PRNGKey(1), 'dropout': jax.random.PRNGKey(2)}, batch)
@jax.jit
def fwd(v, b):
    out = model.apply(v, b, train=False)
    return jnp.sum(out['rcnn_cls'])
db = jax.device_put(batch)
np.asarray(fwd(variables, db))
jax.profiler.start_trace('/root/repo/output/trace3')
for _ in range(3):
    np.asarray(fwd(variables, db))
jax.profiler.stop_trace()
f = sorted(glob.glob('/root/repo/output/trace3/plugins/profile/*/vm.trace.json.gz'))[-1]
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
tot = 0
for name, d in durs.most_common(20):
    print(f'{d/3000:8.1f} ms  {name[:90]}')
