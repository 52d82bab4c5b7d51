"""Scan-timed bisect of the RPN at bench shapes (B8): point stream (SA /
SA+FP), image stream, fusion overhead, heads."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

K = 9


def scan_time(name, op, args, perturb):
    import jax
    import jax.numpy as jnp

    def run_k(k):
        @jax.jit
        def f(args):
            def body(acc, i):
                return acc + op(perturb(args, i)), 0.0
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

    from __graft_entry__ import _full_batch, _full_config
    from epnet_tpu.models.backbone import PointBackbone
    from epnet_tpu.models.rpn import RPN

    cfg = _full_config()
    B = 8
    batch = {k: jnp.asarray(v)
             for k, v in _full_batch(cfg, batch_size=B).items()}

    def pb(args, i):
        v, b = args
        b = dict(b)
        b['pts_input'] = b['pts_input'] + i * 1e-5
        return v, b

    # full RPN (fusion on)
    rpn = RPN(cfg)
    rv = jax.jit(lambda b: rpn.init(jax.random.PRNGKey(0), b['pts_input'],
                                    b['img'], b['pts_origin_xy'],
                                    train=False))(batch)
    scan_time('full RPN (fused)', lambda a: jnp.sum(
        rpn.apply(a[0], a[1]['pts_input'], a[1]['img'],
                  a[1]['pts_origin_xy'], train=False)['rpn_cls']),
        (rv, batch), pb)

    # point-only RPN (LI_FUSION off)
    cfg_np = cfg.merged({'LI_FUSION': {'ENABLED': False}})
    rpn_np = RPN(cfg_np)
    rv2 = jax.jit(lambda b: rpn_np.init(
        jax.random.PRNGKey(0), b['pts_input'], None, None,
        train=False))(batch)
    scan_time('RPN point-only (no fusion)', lambda a: jnp.sum(
        rpn_np.apply(a[0], a[1]['pts_input'], None, None,
                     train=False)['rpn_cls']), (rv2, batch), pb)

    # backbone without heads (fused)
    bk = PointBackbone(cfg)
    bv = jax.jit(lambda b: bk.init(jax.random.PRNGKey(0), b['pts_input'],
                                   b['img'], b['pts_origin_xy'],
                                   train=False))(batch)
    scan_time('backbone (fused, no heads)', lambda a: jnp.sum(
        bk.apply(a[0], a[1]['pts_input'], a[1]['img'],
                 a[1]['pts_origin_xy'], train=False)[1]), (bv, batch), pb)

    # point-only backbone (image+fusion cost = fused - this)
    bk2 = PointBackbone(cfg_np)
    bv2 = jax.jit(lambda b: bk2.init(jax.random.PRNGKey(0), b['pts_input'],
                                     None, None, train=False))(batch)
    scan_time('backbone point-only', lambda a: jnp.sum(
        bk2.apply(a[0], a[1]['pts_input'], None, None,
                  train=False)[1]), (bv2, batch), pb)


if __name__ == '__main__':
    main()
