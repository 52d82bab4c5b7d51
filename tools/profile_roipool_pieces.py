"""Scan-timed roipool3d internals at eval shapes (B8 x 100 rois x 16384)."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

K = 9


def scan_time(name, op, *args):
    import jax
    import jax.numpy as jnp

    def run_k(k):
        @jax.jit
        def f(args):
            def body(acc, i):
                a = (args[0] + i * 1e-5,) + args[1:]
                return acc + op(*a), 0.0
            acc, _ = jax.lax.scan(body, 0.0, jnp.arange(k, dtype=jnp.float32))
            return acc
        np.asarray(f(args))
        t0 = time.time()
        for _ in range(3):
            np.asarray(f(args))
        return (time.time() - t0) / 3

    per = (run_k(K) - run_k(1)) / (K - 1) * 1000
    print(f'{name}: {per:.2f} ms', flush=True)
    return per


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    from epnet_tpu.ops.boxes import enlarge_box3d, points_in_boxes3d
    from epnet_tpu.ops.roipool3d import roipool3d

    B, N, M, S, C = 8, 16384, 100, 512, 130
    kr = jax.random.PRNGKey(0)
    xyz = jax.jit(lambda k: jax.random.uniform(
        k, (B, N, 3), jnp.float32, -35, 35))(kr)
    feats = jax.jit(lambda k: jax.random.normal(
        k, (B, N, C), jnp.float32))(kr)
    boxes = jax.jit(lambda k: jnp.concatenate([
        jax.random.uniform(k, (B, M, 3), jnp.float32, -30, 30),
        jnp.full((B, M, 3), 3.0), jnp.zeros((B, M, 1))], -1))(kr)

    scan_time('full roipool3d', lambda x, f, b: jnp.sum(
        roipool3d(x, f, b, 0.0, S)[0]) + jnp.sum(roipool3d(x, f, b, 0.0, S)[1]), xyz, feats, boxes)

    def mask_only(x, b):
        big = enlarge_box3d(b.reshape(-1, 7), 0.0).reshape(B, M, 7)
        return jnp.sum(points_in_boxes3d(x, big).astype(jnp.float32))

    scan_time('mask (points_in_boxes3d)', mask_only, xyz, boxes)

    def mask_select(x, b):
        big = enlarge_box3d(b.reshape(-1, 7), 0.0).reshape(B, M, 7)
        mask = points_in_boxes3d(x, big)
        iota = jnp.arange(N, dtype=jnp.int32)
        keys = jnp.where(mask, -iota.astype(jnp.float32), -2.0 * N)
        v, first_k = lax.approx_max_k(keys, S, recall_target=0.98)
        return jnp.sum(v) + jnp.sum(first_k)

    scan_time('mask+approx_max_k(512)', mask_select, xyz, boxes)

    idx = jax.jit(lambda k: jax.random.randint(
        k, (B, M * S), 0, N, jnp.int32))(kr)

    def gather_only(x, f, i):
        table = jnp.concatenate([x, f], axis=-1)
        return jnp.sum(jnp.take_along_axis(table, i[..., None], axis=1))

    scan_time('packed gather 100x512 rows x133', gather_only, xyz, feats, idx)

    def gather_bf16(x, f, i):
        table = jnp.concatenate(
            [x, f], axis=-1).astype(jnp.bfloat16)
        return jnp.sum(jnp.take_along_axis(table, i[..., None], axis=1)
                       .astype(jnp.float32))

    scan_time('packed gather bf16', gather_bf16, xyz, feats, idx)


if __name__ == '__main__':
    main()
