"""Isolate the image-branch backward (B4 train shapes).

The branch under test: 4 ImageBlocks -> DeconvFusionHead(+BN+ReLU) ->
5 feature_gather reads at the fusion point counts -> sum. Timed as grad
w.r.t. the raw image + all params via ablations:

  full        — the branch as shipped
  nofinal     — drop the full-res deconv head + its gather
  nogather    — replace every feature_gather with a strided subsample read
                (no scatter in the backward; same tensor shapes out)
  nobn        — deconv head without its BatchNorm
"""
import os
import sys
import time

sys.path.insert(0, os.getcwd())

import numpy as np

K = 6


def scan_time(name, op, perturb, *args):
    import jax
    import jax.numpy as jnp

    def run_k(k):
        @jax.jit
        def f(args):
            def body(acc, i):
                a = perturb(args, i)
                return acc + op(*a), 0.0
            acc, _ = jax.lax.scan(body, 0.0, jnp.arange(k, dtype=jnp.float32))
            return acc
        np.asarray(f(args))
        t0 = time.time()
        for _ in range(3):
            np.asarray(f(args))
        return (time.time() - t0) / 3

    t1 = run_k(1)
    tk = run_k(K)
    per = (tk - t1) / (K - 1) * 1000
    print(f'{name}: {per:.2f} ms', flush=True)
    return per


def main():
    import flax.linen as nn
    import jax
    import jax.numpy as jnp

    from epnet_tpu.models.fusion import DeconvFusionHead, ImageBlock, feature_gather

    B = 4
    IMG_CHANNELS = (3, 64, 128, 256, 512)
    NPTS = (4096, 1024, 256, 64)
    kr = jax.random.PRNGKey(0)

    class Branch(nn.Module):
        final: bool = True
        gather: bool = True
        bn: bool = True

        @nn.compact
        def __call__(self, img, xys, xy0, train=True):
            dt = jnp.bfloat16
            out = 0.0
            x = img
            feats = []
            for i in range(4):
                x = ImageBlock(IMG_CHANNELS[i + 1], dtype=dt,
                               name=f'img_block{i}')(x, train=train)
                feats.append(x)
                if self.gather:
                    g = feature_gather(x, xys[i])
                else:
                    C = x.shape[-1]
                    g = x.reshape(B, -1, C)[:, :NPTS[i], :]  # dense read, no scatter bwd
                out = out + jnp.sum(g.astype(jnp.float32) ** 2)
            if self.final:
                head = DeconvFusionHead(reduce=(16,) * 4, kernels=(2, 4, 8, 16),
                                        features=32, dtype=dt,
                                        name='deconv_fusion')
                if not self.bn:
                    # bypass the BN inside by monkey construction: use the
                    # module but subtract is messy — instead time with BN and
                    # rely on the nofinal delta for the head cost.
                    pass
                fmap = head(feats, train=train)
                if self.gather:
                    gp = feature_gather(fmap, xy0)
                else:
                    gp = fmap.reshape(B, -1, 32)[:, :16384, :]
                out = out + jnp.sum(gp.astype(jnp.float32) ** 2)
            return out

    img = jax.jit(lambda k: jax.random.normal(
        k, (B, 384, 1280, 3), jnp.float32))(kr)
    xys = [jax.jit(lambda k, n=n: jax.random.uniform(
        k, (B, n, 2), jnp.float32, -0.98, 0.98))(kr) for n in NPTS]
    xy0 = jax.jit(lambda k: jax.random.uniform(
        k, (B, 16384, 2), jnp.float32, -0.98, 0.98))(kr)

    variants = sys.argv[1:] or ['full', 'nofinal', 'nogather']
    for name in variants:
        final = name != 'nofinal'
        gather = name != 'nogather'
        m = Branch(final=final, gather=gather)
        params = jax.jit(lambda im: m.init(
            {'params': jax.random.PRNGKey(0)}, im, xys, xy0,
            train=False))(img)

        def loss(p, im):
            out, _ = m.apply(p, im, xys, xy0, train=True,
                             mutable=['batch_stats'])
            return out

        def op(p, im):
            g = jax.grad(loss)(p, im)
            return sum(jnp.sum(x.astype(jnp.float32) ** 2)
                       for x in jax.tree_util.tree_leaves(g))

        scan_time(f'img-branch bwd [{name}]', op,
                  lambda a, i: (a[0], a[1] + i * 1e-5), params, img)

        def fwd(p, im):
            return loss(p, im)

        scan_time(f'img-branch fwd [{name}]', fwd,
                  lambda a, i: (a[0], a[1] + i * 1e-5), params, img)


if __name__ == '__main__':
    main()
