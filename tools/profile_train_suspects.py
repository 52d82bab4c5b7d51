"""fwd vs fwd+bwd cost of the train-regression suspects (B4 shapes):
grid_sample patch gather, roipool train pooling, DeconvFusionHead."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

K = 7


def scan_time(name, op, args):
    import jax
    import jax.numpy as jnp

    def run_k(k):
        @jax.jit
        def f(args):
            def body(acc, i):
                a = (args[0] + (i * 1e-5).astype(args[0].dtype),) + args[1:]
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

    B = 4
    kr = jax.random.PRNGKey(0)
    ks = jax.random.split(kr, 4)

    # grid_sample at the LI-Fusion stages (train dtype bf16 maps)
    stages = [('gs final 16384pts 384x1280x32', 384, 1280, 32, 16384),
              ('gs s0 4096pts 192x640x64', 192, 640, 64, 4096),
              ('gs s1 1024pts 96x320x128', 96, 320, 128, 1024)]
    for name, H, W, C, N in stages:
        fmap = jax.random.normal(ks[0], (B, H, W, C), jnp.bfloat16)
        xy = jax.random.uniform(ks[1], (B, N, 2), jnp.float32, -1, 1)

        scan_time(name + ' fwd',
                  lambda f, x: jnp.sum(grid_sample_points(f, x)
                                       .astype(jnp.float32)), (fmap, xy))

        def fb(f, x):
            def loss(f_):
                return jnp.sum(grid_sample_points(f_, x).astype(jnp.float32))
            return jnp.sum(jax.grad(loss)(f).astype(jnp.float32))

        scan_time(name + ' fwd+bwd', fb, (fmap, xy))

    # roipool train pooling (B4 x 64 rois, f32 features like the train path)
    from epnet_tpu.ops.roipool3d import roipool3d
    pts = jax.random.uniform(ks[0], (B, 16384, 3), jnp.float32, -35, 35)
    feats = jax.random.normal(ks[1], (B, 16384, 130), jnp.float32)
    boxes = jnp.concatenate([
        jax.random.uniform(ks[2], (B, 64, 1), jnp.float32, -30, 30),
        jnp.zeros((B, 64, 1)),
        jax.random.uniform(ks[3], (B, 64, 1), jnp.float32, 5, 60),
        jnp.full((B, 64, 3), 2.0), jnp.zeros((B, 64, 1))], axis=-1)

    scan_time('roipool f32 fwd',
              lambda f: jnp.sum(roipool3d(pts, f, boxes, 0.2, 512)[1]),
              (feats,))

    def rp_fb(f):
        def loss(f_):
            return jnp.sum(roipool3d(pts, f_, boxes, 0.2, 512)[1])
        return jnp.sum(jax.grad(loss)(f))

    scan_time('roipool f32 fwd+bwd', rp_fb, (feats,))

    fb16 = feats.astype(jnp.bfloat16)
    scan_time('roipool bf16 fwd',
              lambda f: jnp.sum(roipool3d(pts, f, boxes, 0.2, 512)[1]
                                .astype(jnp.float32)), (fb16,))

    def rp_fb16(f):
        def loss(f_):
            return jnp.sum(roipool3d(pts, f_, boxes, 0.2, 512)[1]
                           .astype(jnp.float32))
        return jnp.sum(jax.grad(loss)(f).astype(jnp.float32))

    scan_time('roipool bf16 fwd+bwd', rp_fb16, (fb16,))

    # deconv fusion head
    from flax import linen as nn

    from epnet_tpu.models.fusion import DeconvFusionHead
    imgs = [jax.random.normal(k, (B, 192 // (1 << i), 640 // (1 << i),
                                  [64, 128, 256, 512][i]), jnp.bfloat16)
            for i, k in enumerate(jax.random.split(kr, 4))]
    head = DeconvFusionHead(reduce=(16, 16, 16, 16), kernels=(2, 4, 8, 16),
                            features=32, dtype=jnp.bfloat16)
    v = head.init(jax.random.PRNGKey(0), imgs, train=False)

    scan_time('deconv head fwd',
              lambda i0: jnp.sum(head.apply(v, [i0] + imgs[1:], train=False)
                                 .astype(jnp.float32)), (imgs[0],))

    def dh_fb(i0):
        def loss(vv):
            return jnp.sum(head.apply(vv, [i0] + imgs[1:], train=False)
                           .astype(jnp.float32))
        g = jax.grad(loss)(v)
        return sum(jnp.sum(x.astype(jnp.float32))
                   for x in jax.tree_util.tree_leaves(g))

    scan_time('deconv head fwd+bwd(params)', dh_fb, (imgs[0],))


if __name__ == '__main__':
    main()
