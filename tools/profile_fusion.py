import os, sys, time
sys.path.insert(0, os.getcwd())
import numpy as np

def timeit(name, fn, *args, n=5):
    import jax
    r = fn(*args); np.asarray(jax.tree_util.tree_leaves(r)[0])
    t0 = time.time()
    for _ in range(n):
        r = fn(*args); np.asarray(jax.tree_util.tree_leaves(r)[0])
    print(f'{name}: {(time.time()-t0)/n*1000:.1f} ms', flush=True)

import jax, jax.numpy as jnp
from epnet_tpu.ops.grid_sample import grid_sample_points

rng = np.random.RandomState(0)
B = 4
cases = [
    ('s1 map 192x640x64 @4096pts', (B,192,640,64), 4096),
    ('s2 map 96x320x128 @1024pts', (B,96,320,128), 1024),
    ('final 384x1280x32 @16384pts', (B,384,1280,32), 16384),
]
for name, shape, npts in cases:
    fm = jax.device_put(rng.randn(*shape).astype(np.float32))
    xy = jax.device_put(rng.uniform(-1, 1, (B, npts, 2)).astype(np.float32))
    f = jax.jit(lambda a, b: jnp.sum(grid_sample_points(a, b)))
    timeit(name, f, fm, xy)

# IA attention cost at stage 1: 4096 pts, img 64ch -> pc 96
from epnet_tpu.models.fusion import AttenFusionConv
m = AttenFusionConv(96)
pf = jax.device_put(rng.randn(B, 4096, 96).astype(np.float32))
imf = jax.device_put(rng.randn(B, 4096, 64).astype(np.float32))
v = jax.jit(lambda r, a, b: m.init(r, a, b))(jax.random.PRNGKey(0), pf, imf)
timeit('atten fusion s1', jax.jit(lambda v, a, b: jnp.sum(m.apply(v, a, b))), v, pf, imf)
