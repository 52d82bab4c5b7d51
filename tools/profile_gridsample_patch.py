"""Scan-timed: 4-tap take_along_axis grid_sample vs one (2,2,C) patch-gather.

Bilinear with zero padding equals sum over the clipped 2x2 window with
hat weights hat(t)=max(0,1-|t|): out-of-window taps self-zero, so one
lax.gather of a (1,2,2,C) slice per point replaces four row gathers.
"""
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
                d = (i * 1e-5).astype(args[0].dtype)
                a = (args[0] + d,) + args[1:]
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

    from epnet_tpu.ops.grid_sample import grid_sample_points

    def patch_sample(feature_map, xy_norm):
        B, H, W, C = feature_map.shape
        x = (xy_norm[..., 0] + 1.0) * 0.5 * (W - 1)
        y = (xy_norm[..., 1] + 1.0) * 0.5 * (H - 1)
        xs = jnp.clip(jnp.floor(x), 0, W - 2).astype(jnp.int32)
        ys = jnp.clip(jnp.floor(y), 0, H - 2).astype(jnp.int32)
        # one (1,2,2,C) slice per point
        starts = jnp.stack([ys, xs], -1)  # (B, N, 2)
        dnums = jax.lax.GatherDimensionNumbers(
            offset_dims=(2, 3, 4),
            collapsed_slice_dims=(),
            start_index_map=(1, 2),
            operand_batching_dims=(0,),
            start_indices_batching_dims=(0,),
        )
        patch = jax.lax.gather(
            feature_map, starts, dnums, slice_sizes=(1, 2, 2, C),
            mode=jax.lax.GatherScatterMode.CLIP)  # (B, N, 2, 2, C)
        def hat(t):
            return jnp.maximum(0.0, 1.0 - jnp.abs(t))
        wy = jnp.stack([hat(y - ys), hat(y - (ys + 1))], -1)  # (B, N, 2)
        wx = jnp.stack([hat(x - xs), hat(x - (xs + 1))], -1)
        w = (wy[..., :, None] * wx[..., None, :]).astype(feature_map.dtype)
        return jnp.einsum('bnij,bnijc->bnc', w, patch)

    kr = jax.random.PRNGKey(0)
    B = 8
    for name, (Np, Ci, Hs, Ws) in [
        ('stage4 full-res 16384x32', (16384, 32, 384, 1280)),
        ('stage0 4096x64', (4096, 64, 192, 640)),
        ('stage1 1024x128', (1024, 128, 96, 320)),
    ]:
        fm = jax.jit(lambda k, H=Hs, W=Ws, C=Ci: jax.random.normal(
            k, (B, H, W, C), jnp.bfloat16))(kr)
        xy = jax.jit(lambda k, Np=Np: jax.random.uniform(
            k, (B, Np, 2), jnp.float32, -1, 1))(kr)

        # numeric agreement first
        a = np.asarray(grid_sample_points(fm, xy), dtype=np.float32)
        b = np.asarray(patch_sample(fm, xy), dtype=np.float32)
        err = np.max(np.abs(a - b))
        print(f'{name}: max|4tap - patch| = {err:.4f}', flush=True)

        scan_time(f'{name} 4-tap', lambda f, g: jnp.sum(
            grid_sample_points(f, g).astype(jnp.float32)), fm, xy)
        scan_time(f'{name} patch', lambda f, g: jnp.sum(
            patch_sample(f, g).astype(jnp.float32)), fm, xy)


if __name__ == '__main__':
    main()
