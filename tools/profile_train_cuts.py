"""In-graph backward attribution by stop-gradient surgery (round 4).

Round-4 lesson: ISOLATED conv profiling lies. The round-3 "s2 joint-graph
pathology" fix (barriered cotangent, 24.8 -> 13.3 ms isolated across the
tower) measures a 0.1 scans/s no-op inside the real train step
(EPNET_S2_BARRIER A/B, bench.py). So this profiler attributes backward
cost WITHOUT isolating anything: it times the full fwd+bwd train graph
(value_and_grad of the real joint loss at the real B4 shapes), then
re-times it with ``jax.lax.stop_gradient`` spliced onto the outputs of
chosen module subtrees via ``nn.intercept_methods`` — the forward is
unchanged, XLA DCE removes exactly that subtree's backward, and
(baseline - cut) is that subtree's TRUE in-graph backward cost, fusion
context and all.

Cuts (module path substrings, RPN backbone names from models/backbone.py):
  img_all      img_block0..3 + deconv_fusion   (whole image-tower backward)
  img_block0   the 384x1280 block only
  deconv       the fused deconv head + final full-res sample
  sa_all       sa0..3 (point encoder)
  fp_all       fp0..3 (point decoder)
  rcnn         the whole second stage (cut at its two inputs is structural:
               cut module outputs rcnn/* instead — kills SA+head backwards)
  heads        rpn cls/reg heads

Usage: python tools/profile_train_cuts.py [cut ...]  (default: all)

Measured on-chip (2026-08-21, B4). Pre-im2col graph (fwd+bwd 130.2 ms):
img_all 68.7, img_block0 30.0, img_block01 47.8, deconv 9.4, sa_all
12.4, fp_all 6.9, rcnn 7.7, b0_cb0 17.0, b0_conv1 (the RGB stem's dw
alone) 9.8; fusion_all 85.3 (cross-check: cutting every fusion output
severs the cotangent into the whole backbone). Post-im2col graph
(fwd+bwd 114.0 ms): img_all 64.5, img_block0 26.2, img_block01 42.2 —
the image tower remains the dominator and is the round-5 surface.
"""
import os
import sys
import time

sys.path.insert(0, os.getcwd())

import numpy as np

import epnet_tpu  # noqa: F401  (enables the persistent compile cache)

K = 4

CUTS = {
    'baseline': (),
    'img_all': ('img_block', 'deconv_fusion'),
    'img_block0': ('img_block0',),
    'img_block01': ('img_block0', 'img_block1'),
    'deconv': ('deconv_fusion',),
    'sa_all': ('/sa0', '/sa1', '/sa2', '/sa3'),
    'fp_all': ('/fp0', '/fp1', '/fp2', '/fp3'),
    'fusion_all': ('/fusion0', '/fusion1', '/fusion2', '/fusion3',
                   'final_fusion'),
    'rcnn': ('rcnn/',),
    # finer blk0 bisect: cutting Conv2dBlock_0's output removes conv1-dw +
    # BN0-bwd + s2-conv-dx (its input is the cut tensor); what remains of
    # img_block0's 30 ms is s2-dw + the d(img_1) consumers (fusion0's
    # grid-sample scatter, img_block1's first-conv dx)
    'b0_cb0': ('img_block0/Conv2dBlock_0',),
    # cut at the raw s1 conv output (before BN): removes ONLY the stem
    # conv's dw (dx wrt the image is already DCE'd — images aren't
    # differentiated), so baseline - this = the 3->64 dw alone
    'b0_conv1': ('img_block0/Conv2dBlock_0/Conv_0',),
}


def scan_time(name, mk, *args):
    import jax

    def run_k(k):
        f = mk(k)
        np.asarray(jax.tree_util.tree_leaves(f(*args))[0]).ravel()[:4]
        t0 = time.time()
        for _ in range(2):
            np.asarray(jax.tree_util.tree_leaves(f(*args))[0]).ravel()[:4]
        return (time.time() - t0) / 2

    t1 = run_k(1)
    tk = run_k(K)
    per = (tk - t1) / (K - 1) * 1000
    print(f'{name}: {per:.1f} ms', flush=True)
    return per


def main():
    import jax
    import jax.numpy as jnp
    from flax import linen as nn

    from __graft_entry__ import _full_batch, _full_config
    from epnet_tpu.train.loss import joint_loss
    from epnet_tpu.train.trainer import create_train_state, device_batch

    cfg = _full_config()
    B = 4
    batch = _full_batch(cfg, batch_size=B, seed=0, with_labels=True)

    state, model, tx = create_train_state(cfg, jax.random.PRNGKey(0), batch,
                                          total_steps=100)
    db = jax.device_put(device_batch(batch))
    key = jax.random.PRNGKey(0)
    bnm = jnp.float32(0.1)
    rngs = {'sampling': key, 'dropout': key}

    def make_interceptor(substrs):
        def interceptor(next_fun, args, kwargs, context):
            out = next_fun(*args, **kwargs)
            path = '/'.join(str(p) for p in context.module.path)
            if context.method_name == '__call__' and any(
                    s in ('/' + path) for s in substrs):
                out = jax.tree_util.tree_map(jax.lax.stop_gradient, out)
            return out
        return interceptor

    def mk_grad(substrs):
        def loss_fn(params, b):
            with nn.intercept_methods(make_interceptor(substrs)):
                out, _ = model.apply(
                    {'params': params, 'batch_stats': state.batch_stats}, b,
                    train=True, bn_momentum=bnm, rngs=rngs,
                    mutable=['batch_stats'])
            loss, _ = joint_loss(cfg, out, b)
            return loss

        def mk(k):
            @jax.jit
            def f(params, b):
                def body(acc, i):
                    bb = dict(b)
                    bb['pts_input'] = b['pts_input'] + i * 1e-5
                    loss, g = jax.value_and_grad(loss_fn)(params, bb)
                    gsum = sum(jnp.sum(l.astype(jnp.float32))
                               for l in jax.tree_util.tree_leaves(g))
                    return acc + loss + gsum, 0.0
                acc, _ = jax.lax.scan(body, 0.0,
                                      jnp.arange(k, dtype=jnp.float32))
                return acc
            return f
        return mk

    names = sys.argv[1:] or list(CUTS)
    base = None
    for nme in names:
        per = scan_time(f'fwd+bwd [{nme}]', mk_grad(CUTS[nme]),
                        state.params, db)
        if nme == 'baseline':
            base = per
        elif base is not None:
            print(f'   -> {nme} backward in-graph: {base - per:.1f} ms',
                  flush=True)


if __name__ == '__main__':
    main()
