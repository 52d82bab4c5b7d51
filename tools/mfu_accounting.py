"""Step-level MFU / roofline accounting (VERDICT r4 item 3).

Question this answers: is each remaining perf gap fixable lowering waste,
or roofline-bound (i.e. round-6 should change the math, not the
lowering)?

Method — train side: reuse the stop-gradient cut surgery of
tools/profile_train_cuts.py, but pair every cut's SCAN-TIMED per-step
wall time with the XLA ``cost_analysis`` of the SAME jitted program.
Because stop_gradient makes XLA DCE exactly the cut subtree's backward,
(baseline − cut) differences give that subtree's in-graph backward
FLOPs, HBM bytes AND milliseconds — so per-subtree achieved TFLOP/s and
GB/s come from the real fused program, not isolated replays. Eval side:
the stage sub-functions of tools/profile_eval_scan.py, each cost-analyzed
and scan-timed the same way.

Peaks (public TPU v5e specs): 197 TFLOP/s bf16 MXU, 819 GB/s HBM.
%MXU is computed against the bf16 peak — conservative for f32-resident
stages. XLA's "bytes accessed" counts logical operand/result bytes per
HLO; post-fusion HBM traffic is lower, so %HBM is an UPPER bound on
bandwidth pressure. The two columns bracket the roofline: a stage with
low %MXU and low %HBM is latency/VPU/lowering-bound — fixable waste.

Results land in BASELINE.md ("MFU / roofline accounting").

Usage: python tools/mfu_accounting.py [train|eval]
"""
import os
import sys
import time

sys.path.insert(0, os.getcwd())

import numpy as np

import epnet_tpu  # noqa: F401  (compile cache)

PEAK_TFLOPS = 197.0   # v5e bf16
PEAK_GBS = 819.0      # v5e HBM
K = 4

TRAIN_CUTS = {
    'baseline': (),
    'img_all': ('img_block', 'deconv_fusion'),
    'img_block0': ('img_block0',),
    'img_block01': ('img_block0', 'img_block1'),
    'deconv': ('deconv_fusion',),
    'sa_all': ('/sa0', '/sa1', '/sa2', '/sa3'),
    'fp_all': ('/fp0', '/fp1', '/fp2', '/fp3'),
    'rcnn': ('rcnn/',),
}

# Each cut costs TWO fresh XLA compiles of the full fwd+bwd program (k=1
# and k=K); on a cold compile cache that is minutes per cut, so
# EPNET_MFU_CUTS=baseline,img_all,... selects a subset.
_sel = os.environ.get('EPNET_MFU_CUTS', '')
if _sel:
    TRAIN_CUTS = {k: TRAIN_CUTS[k] for k in _sel.split(',')}


def measure(mk, *args):
    """Compile mk(1) and mk(K) ONCE each (AOT), time both, and read the
    k=1 program's cost_analysis — so each cut costs exactly two compiles.
    Returns (ms_per_step, gflop_per_step, gbytes_per_step)."""
    import jax

    def run(c):
        np.asarray(jax.tree_util.tree_leaves(c(*args))[0]).ravel()[:4]
        t0 = time.time()
        for _ in range(2):
            np.asarray(jax.tree_util.tree_leaves(c(*args))[0]).ravel()[:4]
        return (time.time() - t0) / 2

    c1 = mk(1).lower(*args).compile()
    cK = mk(K).lower(*args).compile()
    ca = c1.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    t1, tk = run(c1), run(cK)
    ms = (tk - t1) / (K - 1) * 1000
    # the k=1 scan program's cost minus nothing is ~one step (scan overhead
    # and the perturb add are charged — negligible at these sizes)
    return (ms, ca.get('flops', float('nan')) / 1e9,
            ca.get('bytes accessed', float('nan')) / 1e9)


def row(name, ms, gflop, gb):
    tfps = gflop / ms if ms > 0 else float('nan')      # GFLOP/ms == TFLOP/s
    gbps = 1000.0 * gb / ms if ms > 0 else float('nan')
    print(f'{name:>14}: {ms:7.1f} ms  {gflop:8.1f} GFLOP '
          f'-> {tfps:6.1f} TFLOP/s ({100*tfps/PEAK_TFLOPS:4.1f}% MXU) | '
          f'{gb:7.2f} GB -> {gbps:6.0f} GB/s ({100*gbps/PEAK_GBS:4.1f}% HBM)',
          flush=True)


def train_side():
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

    def loss_for(substrs):
        def loss_fn(params, b):
            with nn.intercept_methods(make_interceptor(substrs)):
                out, _ = model.apply(
                    {'params': params, 'batch_stats': state.batch_stats}, b,
                    train=True, bn_momentum=bnm, rngs=rngs,
                    mutable=['batch_stats'])
            loss, _ = joint_loss(cfg, out, b)
            return loss
        return loss_fn

    def mk_scan(substrs):
        loss_fn = loss_for(substrs)

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

    print(f'== train fwd+bwd (B{B}) absolute, then per-subtree deltas ==')
    meas = {}
    for name, cut in TRAIN_CUTS.items():
        ms, gflop, gbytes = measure(mk_scan(cut), state.params, db)
        meas[name] = (ms, gflop, gbytes)
        row(f'[{name}]', ms, gflop, gbytes)
    b = meas['baseline']
    print('-- in-graph backward deltas (baseline - cut) --')
    for name in TRAIN_CUTS:
        if name == 'baseline':
            continue
        c = meas[name]
        row(f'd {name}', b[0] - c[0], b[1] - c[1], b[2] - c[2])


def eval_side():
    import jax
    import jax.numpy as jnp
    from flax import linen as nn

    from __graft_entry__ import _full_batch, _full_config
    from epnet_tpu.eval.detect import make_joint_eval_step
    from epnet_tpu.models.epnet import EPNet
    from epnet_tpu.models.fusion import ImageBlock
    from epnet_tpu.models.rpn import RPN

    cfg = _full_config()
    B = 8
    batch = {k: jnp.asarray(v)
             for k, v in _full_batch(cfg, batch_size=B).items()}
    model = EPNet(cfg, mode='TEST')
    variables = jax.jit(lambda b: model.init(
        {'params': jax.random.PRNGKey(0), 'sampling': jax.random.PRNGKey(1),
         'dropout': jax.random.PRNGKey(2)}, b, train=False))(batch)
    variables = jax.device_put(variables)

    def pb(args, i):
        v, b = args
        b = dict(b)
        b['pts_input'] = b['pts_input'] + i * 1e-5
        return v, b

    def pb_img(args, i):
        v, b = args
        b = dict(b)
        b['img'] = b['img'] + i * 1e-5
        return v, b

    def stage(name, op, args, perturb=pb):
        def mk(k):
            @jax.jit
            def f(a):
                def body(acc, i):
                    return acc + op(perturb(a, i)), 0.0
                acc, _ = jax.lax.scan(body, 0.0,
                                      jnp.arange(k, dtype=jnp.float32))
                return acc
            return f
        ms, gflop, gbytes = measure(mk, args)
        row(name, ms, gflop, gbytes)

    print(f'== eval stages (B{B}) ==')
    estep = make_joint_eval_step(cfg, model)
    stage('full eval step', lambda a: jnp.sum(
        estep(a[0], a[1])['pred_boxes3d'].astype(jnp.float32)),
        (variables, batch))

    rvars = {'params': variables['params']['rpn'],
             'batch_stats': variables['batch_stats']['rpn']}

    def rpn_fwd(a):
        v, b = a
        out = RPN(cfg).apply(v, b['pts_input'], b.get('img'),
                             b.get('pts_origin_xy'), train=False)
        return (jnp.sum(out['rpn_cls'].astype(jnp.float32))
                + jnp.sum(out['rpn_reg'].astype(jnp.float32)))
    stage('rpn (bb+heads)', rpn_fwd, (rvars, batch))

    # image tower alone (4 ImageBlocks chained at the real strides)
    class Tower(nn.Module):
        channels: tuple = tuple(cfg.LI_FUSION.IMG_CHANNELS[1:])

        @nn.compact
        def __call__(self, x):
            dt = jnp.bfloat16 if cfg.MIXED_PRECISION else None
            outs = []
            for i, c in enumerate(self.channels):
                x = ImageBlock(c, dtype=dt, name=f'img_block{i}')(x, False,
                                                                  0.1)
                outs.append(jnp.sum(x.astype(jnp.float32)))
            return sum(outs)

    tower = Tower()
    tvars = jax.jit(tower.init)(jax.random.PRNGKey(0), batch['img'])

    def tower_fwd(a):
        v, b = a
        return tower.apply(v, b['img'])
    stage('image tower', tower_fwd, (tvars, batch), pb_img)


def main():
    what = sys.argv[1] if len(sys.argv) > 1 else 'both'
    if what in ('train', 'both'):
        train_side()
    if what in ('eval', 'both'):
        eval_side()


if __name__ == '__main__':
    main()
