#!/usr/bin/env python
"""On-hardware verification of TPU-only op fast paths.

The CPU test suite cannot exercise the TPU-dispatch branches (one-hot MXU
gathers, approx_max_k ball query, approx_min_k 3-NN, the Pallas FPS kernel).
This script checks them against reference semantics on the real chip; run it
whenever those paths change:

    python tools/verify_tpu_ops.py
"""

import os
import sys

sys.path.insert(0, os.getcwd())

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from epnet_tpu.ops.fps_pallas import furthest_point_sample_pallas
    from epnet_tpu.ops.pointops import (ball_query, ball_query_nested,
                                        furthest_point_sample,
                                        furthest_point_sample_xla,
                                        group_points, three_nn)

    assert jax.default_backend() == 'tpu', 'run on the TPU host'
    ok = True
    # All data is generated ON-device and every comparison reduces to a
    # scalar ON-device: the axon tunnel moves bulk arrays at ~MB/s, so
    # host round-trips of MB-scale test tensors dominate wall time
    # otherwise (see memory: axon-profiling-discipline).
    key = jax.random.PRNGKey(0)

    def gather_ref(pts, idx):  # plain-gather semantics, on device
        return jnp.take_along_axis(pts[:, None], idx[..., None], axis=2)

    # one-hot MXU gathers must be bit-exact
    for B, N, C, M, S in [(4, 512, 131, 128, 64), (2, 64, 7, 16, 8),
                          (3, 1024, 33, 100, 16)]:
        k1, k2, key = jax.random.split(key, 3)
        pts = jax.random.normal(k1, (B, N, C), jnp.float32)
        idx = jax.random.randint(k2, (B, M, S), 0, N, jnp.int32)
        exact = bool(jnp.array_equal(group_points(pts, idx),
                                     gather_ref(pts, idx)))
        ok &= exact
        print(f'group_points one-hot N={N}: bit-exact={exact}', flush=True)

    # Pallas FPS vs XLA recurrence (f32 ties may differ; require >=99.9% agree)
    k1, key = jax.random.split(key)
    xyz = jax.random.normal(k1, (8, 16384, 3), jnp.float32)
    a = furthest_point_sample_pallas(xyz, 4096)
    b = furthest_point_sample_xla(xyz, 4096)
    agree = float(jnp.mean((a == b).astype(jnp.float32)))
    ok &= agree > 0.999
    print(f'pallas FPS vs XLA agreement: {agree:.6f} (ties may differ)',
          flush=True)

    # partitioned FPS: per-slice selections must be valid global indices of
    # their own slice and distinct within a scene
    pidx = furthest_point_sample(xyz, 4096, groups=8)
    # slot j holds a point of slice j%8 (global = local*8 + g), and all
    # selections within a scene are distinct
    slice_ok = bool(jnp.all(pidx % 8 == jnp.arange(4096)[None] % 8))
    counts = jnp.zeros((8, 16384), jnp.int32).at[
        jnp.arange(8)[:, None], pidx].add(1)
    distinct = bool(jnp.max(counts) == 1)
    ok &= distinct and slice_ok
    print(f'partitioned FPS G=8: slices={slice_ok} distinct={distinct}',
          flush=True)

    # approx ball query: selected neighbours must lie inside the radius
    k1, key = jax.random.split(key)
    small = jax.random.normal(k1, (2, 2048, 3), jnp.float32)
    cen = small[:, :256]
    idx = ball_query(0.8, 16, small, cen)
    d = jnp.linalg.norm(gather_ref(small, idx) - cen[:, :, None, :], axis=-1)
    has_hit = d.min(-1) < 0.8
    inside = float(jnp.sum(jnp.where(has_hit[..., None], d < 0.8 + 1e-5, 0.0))
                   / (jnp.sum(has_hit) * 16))
    # recall-0.95 misses are padded with the first hit; a small fraction of
    # pad slots can reference an out-of-ball point when the top slot itself
    # was a miss. Documented behaviour (~0.3-0.7%).
    ok &= inside > 0.98
    print(f'approx ball query: in-radius fraction={inside:.6f} (>0.98 ok)',
          flush=True)

    # nested multi-scale query: slots distance-sorted, prefix counts honest
    nidx, cnts = ball_query_nested([0.4, 0.8], [8, 16], small, cen)
    nd = jnp.linalg.norm(gather_ref(small, nidx) - cen[:, :, None, :],
                         axis=-1)
    live = (jnp.arange(16)[None, None] < cnts[1][..., None])
    # sorted in the bf16 KEY space the kernel selects in (-d2/r^2 as bf16);
    # true f32 distances may invert within a bf16 rounding bucket
    d2k = ((nd / 0.8) ** 2).astype(jnp.bfloat16)
    sorted_frac = float(
        jnp.sum(jnp.where(live[..., 1:],
                          jnp.diff(d2k.astype(jnp.float32), axis=-1) >= 0.0,
                          1.0))
        / live[..., 1:].size)
    inner_ok = float(jnp.sum(jnp.where(
        jnp.arange(16)[None, None] < cnts[0][..., None],
        nd < 0.4 * (1 + 1e-2), 1.0)) / live.size)
    ok &= sorted_frac > 0.99 and inner_ok > 0.98
    print(f'nested ball query: sorted={sorted_frac:.4f} inner-radius '
          f'ok={inner_ok:.4f}', flush=True)

    # 16-bit packed roipool gather: xyz must round-trip the uint16 bitcast
    # bit-exactly on the chip and features must equal the f32-path selection
    from epnet_tpu.ops.roipool3d import roipool3d
    k1, k2, key = jax.random.split(key, 3)
    rp_pts = jax.random.uniform(k1, (2, 2048, 3), jnp.float32, -20, 20)
    rp_feats = jax.random.normal(k2, (2, 2048, 9), jnp.float32)
    rp_boxes = jnp.concatenate([
        jax.random.uniform(k1, (2, 16, 1), jnp.float32, -15, 15),
        jnp.zeros((2, 16, 1)),
        jax.random.uniform(k2, (2, 16, 1), jnp.float32, -15, 15),
        jnp.full((2, 16, 3), 4.0), jnp.zeros((2, 16, 1))], axis=-1)
    px32, pf32, e32, _ = roipool3d(rp_pts, rp_feats, rp_boxes, 0.5,
                                sampled_pt_num=32)
    px16, pf16, e16, _ = roipool3d(rp_pts, rp_feats.astype(jnp.bfloat16),
                                rp_boxes, 0.5, sampled_pt_num=32)
    xyz_exact = bool(jnp.array_equal(px32, px16))
    feat_exact = bool(jnp.array_equal(pf32.astype(jnp.bfloat16), pf16))
    flag_same = bool(jnp.array_equal(e32, e16))
    ok &= xyz_exact and feat_exact and flag_same
    print(f'roipool3d bf16 packed: xyz bit-exact={xyz_exact} '
          f'feats={feat_exact} empty-flag={flag_same}', flush=True)

    # approx three_nn: distances must be (near-)sorted nearest
    d3, i3 = three_nn(small, cen)
    mono = float(jnp.mean((jnp.diff(d3, axis=-1) >= -1e-5)
                          .astype(jnp.float32)))
    print(f'approx three_nn: sorted fraction={mono:.6f}', flush=True)
    ok &= mono > 0.99

    # windowed fused SA (RCNN tower speed path) vs the dense fused module on
    # spatially-ordered per-roi clouds: feature agreement on the chip
    from epnet_tpu.models.pointnet2 import SAModuleMSG
    ks = jax.random.split(key, 3)
    T, N = 8, 512
    rx = jnp.sort(jax.random.uniform(ks[0], (T, N), jnp.float32, -2, 2), 1)
    rxyz = jnp.stack([rx,
                      jax.random.uniform(ks[1], (T, N), jnp.float32, -0.8, 0.8),
                      jax.random.uniform(ks[2], (T, N), jnp.float32, -1, 1)],
                     -1)
    rfeats = jax.random.normal(ks[1], (T, N, 128), jnp.bfloat16)
    kw = dict(npoint=128, radii=(0.2,), nsamples=(64,),
              mlps=((128, 128, 128),), use_xyz=True, bn=False,
              dtype=jnp.bfloat16)
    mod_w = SAModuleMSG(block_local=True, block_window=256, block_c=32, **kw)
    mod_d = SAModuleMSG(block_local=False, **kw)
    v = jax.jit(mod_d.init)(jax.random.PRNGKey(7), rxyz, rfeats)
    nx_d, f_d, idx_d = jax.jit(mod_d.apply)(v, rxyz, rfeats)
    nx_w, f_w, idx_w = jax.jit(mod_w.apply)(v, rxyz, rfeats)
    same_set = bool(jnp.array_equal(jnp.sort(idx_d, -1), idx_w))
    order = jnp.argsort(idx_d, -1)
    fd = jnp.take_along_axis(f_d, order[..., None], 1).astype(jnp.float32)
    fw = f_w.astype(jnp.float32)
    rel = jnp.abs(fd - fw) / (jnp.abs(fd) + 1e-2)
    close = float(jnp.mean((rel < 0.05).astype(jnp.float32)))
    ok &= same_set and close > 0.9
    print(f'windowed fused SA: same centroid set={same_set} '
          f'feature agreement={close:.4f}', flush=True)

    if '--e2e' in sys.argv:
        ok &= e2e_exact_vs_approx()

    print('ALL OK' if ok else 'FAILURES PRESENT')
    sys.exit(0 if ok else 1)


def e2e_exact_vs_approx():
    """End-to-end accuracy ablation of the two TPU approximations.

    The shipped TPU query path uses ``approx_max_k``/``approx_min_k``
    (recall ~0.95, bf16 tie-break keys) where the reference CUDA kernels
    are exact (ball_query_gpu.cu:28-44, interpolate_gpu.cu:30-50). This
    trains the tiny detector on a structured synthetic scene ON THE CHIP
    with the shipped path, then evaluates twice — approx (default) and
    exact (``EXACT_QUERIES=True``).

    Pass condition: the SHIPPED path localizes every gt (IoU > 0.5) and is
    not worse than the exact-policy eval. Expect the exact-policy eval of
    this approx-trained model to be WORSE, not equal: bf16 keys collapse
    the ascending-index tie-break, so approx samples dense balls spread
    across the cloud while exact takes the lowest-index points — the
    learned features co-adapt to the sampling policy, and switching policy
    between train and eval is a distribution shift (isolated to ball_query;
    three_nn exactness changes nothing). Exact-trained + exact-evaled
    reaches the same quality (tests/test_overfit.py on CPU). Train and
    evaluate with ONE policy; both are supported, mixing them is not.
    (VERDICT r1 item 4c.)
    """
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, os.path.join(os.getcwd(), 'tests'))
    from epnet_tpu.eval.detect import make_joint_eval_step
    from epnet_tpu.models.epnet import EPNet
    from epnet_tpu.ops import pointops
    from epnet_tpu.ops.rotated_iou import boxes_iou3d
    from epnet_tpu.train.trainer import create_train_state, jit_train_step
    from epnet_tpu.utils.testing import synthetic_batch, tiny_config

    cfg = tiny_config().merged({
        'TRAIN': {'LR': 0.02, 'RPN_PRE_NMS_TOP_N': 128,
                  'RPN_POST_NMS_TOP_N': 32},
        'RPN': {'DP_RATIO': 0.0},
    })
    rng = np.random.RandomState(11)
    batch = synthetic_batch(rng, cfg, batch=2, structured=True)
    batch = jax.device_put(batch)  # once — not 300x through the slow tunnel
    state, model, tx = create_train_state(cfg, jax.random.PRNGKey(0), batch,
                                          total_steps=300)
    step = jit_train_step(cfg, model, tx)
    key = jax.random.PRNGKey(3)
    for _ in range(300):
        state, tb = step(state, batch, key, jnp.float32(0.1))
    print(f'e2e ablation: trained on-chip, final loss {float(tb["loss"]):.3f}',
          flush=True)

    variables = {'params': state.params, 'batch_stats': state.batch_stats}
    per_gt = {}
    for mode, exact in (('approx', False), ('exact', True)):
        pointops.EXACT_QUERIES = exact
        try:
            eval_model = EPNet(cfg, mode='TEST')
            eval_step = jax.jit(make_joint_eval_step(cfg, eval_model))
            res = jax.device_get(eval_step(variables, batch))
        finally:
            pointops.EXACT_QUERIES = None
        ious = []
        for b in range(2):
            gt = batch['gt_boxes3d'][b]
            order = np.argsort(-res['norm_scores'][b])
            top = res['pred_boxes3d'][b][order[:10]]
            iou = np.asarray(boxes_iou3d(jnp.asarray(top), jnp.asarray(gt)))
            ious.extend(iou.max(axis=0).tolist())
        per_gt[mode] = np.array(ious)
        print(f'e2e ablation [{mode}]: per-gt IoU '
              f'{np.round(per_gt[mode], 3).tolist()}', flush=True)

    # Per-gt IoUs at this scene carry ~±0.1 of trajectory noise — fp-level
    # numerics changes alone move a single gt that much (see the chaotic-
    # divergence analysis in tools/cmp_fused_head.py / tests/test_overfit.py)
    # — so bound single-gt deltas at 0.15 and the MEAN delta (which averages
    # the noise out) at 0.05.
    delta = per_gt['exact'] - per_gt['approx']
    good = bool((delta < 0.15).all() and abs(delta.mean()) < 0.05
                and (per_gt['approx'] > 0.5).all())
    print(f'e2e ablation: exact-minus-approx IoU delta max '
          f'{delta.max():.4f} (<0.15 ok) mean {delta.mean():.4f} (|.|<0.05 '
          f'ok), approx min {per_gt["approx"].min():.3f}'
          f' (>0.5 ok) -> {"OK" if good else "FAIL"}', flush=True)
    return good


if __name__ == '__main__':
    main()
