"""Decompose the rotated-bench delta (VERDICT r3 item 2).

Round-3 history: bench.py replayed ONE structured batch for all 10 scan
iterations and measured 162.2 scans/s; rotating 5 distinct scenes through
the scan (the honest protocol — different geometry per iteration) measured
106.7. Nobody decomposed the 26 ms/step delta: is it (a) genuinely varied
geometry hitting data-dependent costs (NMS early-exit depth, approx_max_k
recall, ball-query occupancy), (b) the stacked-batch
``dynamic_index_in_dim`` copy that rotation added to the loop body, or
(c) per-scene variance (one pathological seed dragging the mean)?

Variants, all through the same fwd path as bench.py (B8, speed mode):

  replay     — one device batch closed over, no stacked gather (the old
               round-3 protocol; should reproduce ~162)
  gather1    — 5-scene stacked batch + dynamic_index_in_dim, but index
               pinned to 0: same geometry every step, WITH the copy.
               gather1 - replay = the pure gather/copy cost.
  gathersame — stacked batch holding 5 COPIES of scene 0, rotating index:
               same geometry, index varies (defeats any hoisting).
  rotate     — the shipped protocol (5 distinct scenes, rotating index;
               should reproduce ~107).  rotate - gathersame = the cost of
               GEOMETRY variation alone.
  scene{k}   — each scene replayed alone (old protocol) — per-scene
               intrinsic cost; variance here means the honest number is a
               mean over genuinely-different workloads, not a regression.

Run on the real chip: python tools/profile_rotate_decomp.py

RESULT (2026-08-21, B8 speed mode): replay 49.2-49.6 ms/step across all
5 scenes (162 scans/s — reproduces the round-3 headline), gather1 49.5
(the stacked dynamic_index gather is free), gathersame 75.8 (+26.2 ms:
a loop-VARYING index defeats XLA's hoisting of the loop-invariant image
stream out of the scan), rotate 75.2 (geometry variation itself is
free). The whole round-3 162 -> 107 delta was hoisting, not harder
geometry; the rotated number is the honest per-scan cost since real
deployment sees a new image every scan.
"""
import os
import sys
import time

sys.path.insert(0, os.getcwd())

import numpy as np

import epnet_tpu  # noqa: F401  (enables the persistent compile cache)

BATCH = int(os.environ.get('EPNET_BENCH_B', '8'))
ITERS = 10
ROTATE = 5
WARMUP = 2


def main():
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _full_batch, _full_config
    from epnet_tpu.models.epnet import EPNet

    cfg = _full_config()
    batches = [_full_batch(cfg, batch_size=BATCH, seed=r)
               for r in range(ROTATE)]
    model = EPNet(cfg, mode='TEST')
    init = jax.jit(lambda r, b: model.init(r, b, train=False))
    variables = jax.device_put(init(
        {'params': jax.random.PRNGKey(0), 'sampling': jax.random.PRNGKey(1),
         'dropout': jax.random.PRNGKey(2)},
        batches[0]))

    def fwd(variables, batch):
        out = model.apply(variables, batch, train=False)
        return jnp.sum(out['rcnn_cls']) + jnp.sum(out['rcnn_reg'])

    def run(make_step, tag, data):
        # data passed as a jit ARG — closure-captured device arrays get
        # baked into the HLO as constants and overflow the remote compile
        # service's request-size limit at 5-scene stacks (HTTP 413)
        step = jax.jit(make_step)
        for _ in range(WARMUP):
            np.asarray(step(variables, data))
        t0 = time.perf_counter()
        np.asarray(step(variables, data))
        dt = time.perf_counter() - t0
        sps = BATCH * ITERS / dt
        ms = dt / ITERS * 1000
        print(f'{tag}: {ms:.2f} ms/step, {sps:.1f} scans/s', flush=True)
        return ms

    seeds = jnp.arange(ITERS, dtype=jnp.float32)

    def make_replay(variables, dev):
        def body(acc, seed):
            b = dict(dev)
            b['pts_input'] = b['pts_input'] + seed * 1e-6
            return acc + fwd(variables, b), 0.0
        acc, _ = jax.lax.scan(body, 0.0, seeds)
        return acc

    # --- replay (old protocol) + per-scene ---
    per_scene = []
    for k in range(ROTATE):
        per_scene.append(run(make_replay, f'scene{k} replay',
                             jax.device_put(batches[k])))
    print(f'scene replay mean: {np.mean(per_scene):.2f} ms '
          f'(min {min(per_scene):.2f}, max {max(per_scene):.2f})', flush=True)

    stacked = jax.device_put(jax.tree_util.tree_map(
        lambda *xs: np.stack(xs, 0), *batches))
    same = jax.device_put(jax.tree_util.tree_map(
        lambda x: np.stack([x] * ROTATE, 0), batches[0]))

    def gather_step(mod, variables, data):
        def body(acc, seed):
            i = jnp.mod(seed.astype(jnp.int32), mod)
            b = jax.tree_util.tree_map(
                lambda x: jax.lax.dynamic_index_in_dim(
                    x, i, 0, keepdims=False), data)
            b['pts_input'] = b['pts_input'] + seed * 1e-6
            return acc + fwd(variables, b), 0.0
        acc, _ = jax.lax.scan(body, 0.0, seeds)
        return acc

    import functools
    g1 = run(functools.partial(gather_step, 1),
             'gather1 (stacked, idx=0)', stacked)
    gs = run(functools.partial(gather_step, ROTATE),
             'gathersame (5x scene0, rotating idx)', same)
    rot = run(functools.partial(gather_step, ROTATE),
              'rotate (shipped protocol)', stacked)

    rep = per_scene[0]
    print(f'\ndecomposition (ms/step): gather copy = {g1 - rep:+.2f} '
          f'(gather1 - scene0 replay); idx variance = {gs - g1:+.2f} '
          f'(gathersame - gather1); geometry variation = {rot - gs:+.2f} '
          f'(rotate - gathersame); scene mix vs scene0 = '
          f'{np.mean(per_scene) - rep:+.2f}', flush=True)


if __name__ == '__main__':
    main()
