"""End-to-end throughput benchmark on the real TPU chip.

Metric: KITTI val scans/sec/chip through the FULL inference path (two-stream
RPN backbone + proposal NMS + RoI pooling + RCNN refinement) at real shapes
(16384 points, 384x1280 image, 9000->100 proposals).

Timing notes: inputs are placed on device once; completion is forced by
fetching a small output slice each iteration (on the axon remote platform
``block_until_ready`` returns before execution finishes, so host fetch is
the only reliable fence).

Inputs are structured KITTI-like scenes (ground plane + car-surface
clusters + clutter with 1/z density, see utils/testing.py:structured_scene)
— uniform random clouds would misrepresent the clustering-sensitive ops
(NMS early-exit depth, ball-query occupancy, approx_max_k recall).

Baseline: the reference publishes no speed numbers. ``vs_baseline`` anchors
to the DERIVED 66.6 scans/sec for the torch/CUDA reference on one A100 at
batch 4 — the generous end of the per-op cost model in
tools/baseline_cost_model.py (see BASELINE.md for the derivation; the
batch-1 figure, the reference's actual eval default, is 34.5). Round-1
BENCH json used a guessed 20.0 anchor and is not comparable.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import time

A100_BASELINE_SCANS_PER_SEC = 66.6  # tools/baseline_cost_model.py, batch 4
BATCH = int(__import__('os').environ.get('EPNET_BENCH_B', '8'))
WARMUP = 2
ITERS = 10


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from __graft_entry__ import _full_batch, _full_config
    from epnet_tpu.models.epnet import EPNet

    cfg = _full_config()
    batch = _full_batch(cfg, batch_size=BATCH)
    model = EPNet(cfg, mode='TEST')
    init = jax.jit(lambda r, b: model.init(r, b, train=False))
    variables = init(
        {'params': jax.random.PRNGKey(0), 'sampling': jax.random.PRNGKey(1),
         'dropout': jax.random.PRNGKey(2)},
        batch)

    def fwd(variables, batch):
        out = model.apply(variables, batch, train=False)
        # checksum depends on the rcnn head so nothing is dead-code-eliminated
        return jnp.sum(out['rcnn_cls']) + jnp.sum(out['rcnn_reg'])

    @jax.jit
    def fwd_n_steps(variables, batch, seeds):
        # steady-state throughput: ITERS full inference passes in one
        # program (per-dispatch host overhead on the remote platform would
        # otherwise dominate; real deployments pipeline dispatch anyway).
        # Each step perturbs the input so no step can be CSE'd away.
        def body(acc, seed):
            b = dict(batch)
            b['pts_input'] = batch['pts_input'] + seed * 1e-6
            return acc + fwd(variables, b), 0.0
        acc, _ = jax.lax.scan(body, 0.0, seeds)
        return acc

    device_batch = jax.device_put(batch)
    variables = jax.device_put(variables)
    seeds = jnp.arange(ITERS, dtype=jnp.float32)
    for _ in range(WARMUP):
        np.asarray(fwd_n_steps(variables, device_batch, seeds))  # hard sync

    t0 = time.perf_counter()
    np.asarray(fwd_n_steps(variables, device_batch, seeds))
    dt = time.perf_counter() - t0

    scans_per_sec = BATCH * ITERS / dt
    print(json.dumps({
        'metric': 'KITTI val scans/sec/chip (RPN+RCNN e2e)',
        'value': round(scans_per_sec, 3),
        'unit': 'scans/sec',
        'vs_baseline': round(scans_per_sec / A100_BASELINE_SCANS_PER_SEC, 3),
    }))


if __name__ == '__main__':
    main()
