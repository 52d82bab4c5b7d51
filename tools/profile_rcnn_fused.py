"""RCNN tower forward: fused Pallas SA interior vs unfused, on the real chip."""
import os
import sys
import time

sys.path.insert(0, os.getcwd())

import numpy as np


def timeit(name, fn, *args, n=10):
    import jax

    def fence(r):
        x = jax.tree_util.tree_leaves(r)[0]
        np.asarray(x.ravel()[:8])

    fence(fn(*args))
    t0 = time.time()
    for _ in range(n):
        fence(fn(*args))
    dt = (time.time() - t0) / n * 1000
    print(f'{name}: {dt:.1f} ms', flush=True)
    return dt


def main():
    import jax
    import jax.numpy as jnp

    import epnet_tpu.models.pointnet2 as p2
    from __graft_entry__ import _full_config
    from epnet_tpu.models.rcnn import RCNNNet

    cfg = _full_config()
    rng = np.random.RandomState(0)
    T, S, C = 800, 512, 133  # B8 x 100 rois, pooled canonical points
    pooled = rng.randn(T, S, C).astype(np.float32) * 0.5
    pooled[..., 0:3] = rng.uniform(-2, 2, (T, S, 3))
    pooled = jax.device_put(pooled)

    rcnn = RCNNNet(cfg)
    rinit = jax.jit(lambda r, p: rcnn.init(r, p, train=False))
    rv = rinit({'params': jax.random.PRNGKey(0), 'dropout': jax.random.PRNGKey(1)},
               pooled)
    rv = jax.device_put(rv)

    fwd = jax.jit(lambda v, p: jnp.sum(rcnn.apply(v, p, train=False)['rcnn_cls']
                                       .astype(jnp.float32)))
    t_f = timeit('rcnn tower fwd FUSED (800 rois)', fwd, rv, pooled)

    # gradient step through the tower (exercises the custom VJP)
    def loss(params, p):
        out = rcnn.apply({'params': params}, p, train=False)
        return jnp.sum(out['rcnn_cls'].astype(jnp.float32) ** 2) * 1e-3

    gr = jax.jit(jax.grad(loss))
    t_g = timeit('rcnn tower fwd+bwd FUSED', gr, rv['params'], pooled)

    orig = p2.fused_sa_available
    p2.fused_sa_available = lambda *a, **k: False
    fwd2 = jax.jit(lambda v, p: jnp.sum(rcnn.apply(v, p, train=False)['rcnn_cls']
                                        .astype(jnp.float32)))
    t_u = timeit('rcnn tower fwd UNFUSED (800 rois)', fwd2, rv, pooled)
    gr2 = jax.jit(jax.grad(loss))
    t_gu = timeit('rcnn tower fwd+bwd UNFUSED', gr2, rv['params'], pooled)
    p2.fused_sa_available = orig

    # numeric agreement on-chip
    a = np.asarray(jax.jit(lambda v, p: rcnn.apply(v, p, train=False)['rcnn_reg'])(rv, pooled), np.float32)
    p2.fused_sa_available = lambda *a_, **k: False
    b = np.asarray(jax.jit(lambda v, p: rcnn.apply(v, p, train=False)['rcnn_reg'])(rv, pooled), np.float32)
    p2.fused_sa_available = orig
    rel = np.abs(a - b).max() / (np.abs(b).max() + 1e-9)
    print(f'fused-vs-unfused rcnn_reg max rel err: {rel:.2e}', flush=True)
    print(f'speedup fwd: {t_u / t_f:.2f}x   fwd+bwd: {t_gu / t_g:.2f}x', flush=True)


if __name__ == '__main__':
    main()
