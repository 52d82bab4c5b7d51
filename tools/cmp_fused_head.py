"""A/B: fused vs dense DeconvFusionHead over the first train steps of the
structured-overfit config (CPU, f32) — step losses should agree to fp
noise if the custom VJP is correct; gradual drift afterwards is chaos,
not a bug. Usage: python tools/cmp_fused_head.py [n_steps]
"""
import os
import sys

os.environ.setdefault('XLA_FLAGS', '--xla_force_host_platform_device_count=1')
import jax

jax.config.update('jax_platforms', 'cpu')
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), 'tests'))

import jax.numpy as jnp
import numpy as np

from tiny import synthetic_batch, tiny_config
from epnet_tpu.train.trainer import create_train_state, jit_train_step


def run(cfg, batch, fused, n):
    os.environ['EPNET_FUSED_HEAD'] = '1' if fused else '0'
    state, model, tx = create_train_state(cfg, jax.random.PRNGKey(0), batch,
                                          total_steps=300)
    step = jit_train_step(cfg, model, tx)
    key = jax.random.PRNGKey(3)
    losses = []
    for _ in range(n):
        state, tb = step(state, batch, key, jnp.float32(0.1))
        losses.append(float(tb['loss']))
    return losses


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    cfg = tiny_config().merged({
        'TRAIN': {'LR': 0.02, 'RPN_PRE_NMS_TOP_N': 128,
                  'RPN_POST_NMS_TOP_N': 32},
        'RPN': {'DP_RATIO': 0.0}})
    rng = np.random.RandomState(11)
    batch = synthetic_batch(rng, cfg, batch=2, structured=True)
    a = run(cfg, batch, True, n)
    b = run(cfg, batch, False, n)
    for i, (x, y) in enumerate(zip(a, b)):
        rel = abs(x - y) / max(abs(y), 1e-9)
        print(f'step {i}: fused {x:.8f} dense {y:.8f} rel {rel:.2e}',
              flush=True)


if __name__ == '__main__':
    main()
