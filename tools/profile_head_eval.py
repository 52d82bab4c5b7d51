"""Eval-path deconv-head variants at real LI-fusion shapes (B8), scan-timed.

Round-5 question (VERDICT r4 item 4): the first fused-eval head
(running-stat BN, 4 corner-ROW gathers) REGRESSED the full bench 103.3 ->
90.8 scans/s, i.e. +1.4 ms/scan. Variants here:

  dense      — four full-res scale maps + sum + BN + relu + patch-grid-sample
               (the pre-round-5 eval path, EPNET_FUSED_HEAD_EVAL=0)
  fused_rows — half-res ph + 4 corner-row gathers (the regressing version,
               kept inline here for the record)
  fused_patch— half-res ph + ONE (2,2,4F) patch gather per point (shipped
               deconv_bn_relu_sample_eval)

Shapes: xs scales (192x640x64, 96x320x128, 48x160x256, 24x80x512) folded to
F=32, N=16384 points, B=8, bf16 — the flagship eval configuration.
"""
import os
import sys
import time

sys.path.insert(0, os.getcwd())

import numpy as np

import epnet_tpu  # noqa: F401

K = 9


def scan_time(name, op, args, perturb):
    import jax
    import jax.numpy as jnp

    def run_k(k):
        @jax.jit
        def f(a):
            def body(acc, i):
                return acc + op(perturb(a, i)), 0.0
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

    from epnet_tpu.ops import deconv_sample as dsx

    B, F, N = 8, 32, 16384
    H, W = 384, 1280
    ks = (2, 4, 8, 16)
    Cs = (64, 128, 256, 512)
    rng = np.random.RandomState(0)
    dt = jnp.bfloat16
    xs = tuple(jnp.asarray(rng.randn(B, H // k, W // k, C).astype(np.float32),
                           dtype=dt) for k, C in zip(ks, Cs))
    cws = tuple(jnp.asarray(
        (rng.randn(C, k * k * F) / np.sqrt(C)).astype(np.float32), dtype=dt)
        for k, C in zip(ks, Cs))
    bias_fused = jnp.asarray(rng.randn(F).astype(np.float32))
    scale = jnp.asarray(1.0 + 0.1 * rng.randn(F).astype(np.float32))
    bias = jnp.asarray(0.1 * rng.randn(F).astype(np.float32))
    mean = jnp.asarray(0.1 * rng.randn(F).astype(np.float32))
    var = jnp.asarray(1.0 + 0.1 * rng.rand(F).astype(np.float32))
    xy = jnp.asarray(rng.uniform(-0.99, 0.99, (B, N, 2)).astype(np.float32))

    args = (xs, cws, xy)

    def pb(a, i):
        xs_, cws_, xy_ = a
        return (tuple(x + i * 1e-6 for x in xs_), cws_, xy_)

    def dense(a):
        xs_, cws_, xy_ = a
        total = None
        for x, cw, k in zip(xs_, cws_, ks):
            b, h, w, _ = x.shape
            y = (x @ cw).reshape(b, h, w, k, k, F)
            y = y.transpose(0, 1, 3, 2, 4, 5).reshape(b, h * k, w * k, F)
            total = y if total is None else total + y
        total = total + bias_fused.astype(total.dtype)
        z = (total - mean.astype(total.dtype)) * (
            jax.lax.rsqrt(var + 1e-5) * scale).astype(total.dtype) \
            + bias.astype(total.dtype)
        z = jnp.maximum(z, 0)
        from epnet_tpu.ops.grid_sample import grid_sample_points
        out = grid_sample_points(z, xy_)
        return jnp.sum(out.astype(jnp.float32))

    def fused_rows(a):
        xs_, cws_, xy_ = a
        ph = dsx._build_ph(xs_, cws_, bias_fused, ks, F)
        in_dtype = ph.dtype
        H2, W2 = H // 2, W // 2
        rows, wts, _, _ = dsx._corner_data(xy_, H, W)
        ph_c = dsx._gather_rows(ph.reshape(B, H2 * W2 * 4, F), rows)
        w_fold = (jax.lax.rsqrt(var + 1e-5) * scale).astype(in_dtype)
        post = (ph_c - mean.astype(in_dtype)) * w_fold \
            + bias.astype(in_dtype)
        z = jnp.maximum(post, 0)
        out = jnp.einsum('bnc,bncf->bnf', wts.astype(in_dtype), z)
        return jnp.sum(out.astype(jnp.float32))

    def fused_patch(a):
        xs_, cws_, xy_ = a
        out = dsx.deconv_bn_relu_sample_eval(
            xs_, cws_, bias_fused, scale, bias, mean, var, xy_, ks, 1e-5)
        return jnp.sum(out.astype(jnp.float32))

    scan_time('dense', dense, args, pb)
    scan_time('fused_rows', fused_rows, args, pb)
    scan_time('fused_patch', fused_patch, args, pb)




def decompose():
    """Which piece of the ~39 ms is slow? matmuls alone, +regroup (ph),
    +gather. Run: python tools/profile_head_eval.py decompose"""
    import jax
    import jax.numpy as jnp

    from epnet_tpu.ops import deconv_sample as dsx

    B, F, N = 8, 32, 16384
    H, W = 384, 1280
    ks = (2, 4, 8, 16)
    Cs = (64, 128, 256, 512)
    rng = np.random.RandomState(0)
    dt = jnp.bfloat16
    xs = tuple(jnp.asarray(rng.randn(B, H // k, W // k, C).astype(np.float32),
                           dtype=dt) for k, C in zip(ks, Cs))
    cws = tuple(jnp.asarray(
        (rng.randn(C, k * k * F) / np.sqrt(C)).astype(np.float32), dtype=dt)
        for k, C in zip(ks, Cs))
    bias_fused = jnp.asarray(rng.randn(F).astype(np.float32))
    xy = jnp.asarray(rng.uniform(-0.99, 0.99, (B, N, 2)).astype(np.float32))
    args = (xs, cws, xy)

    def pb(a, i):
        xs_, cws_, xy_ = a
        return (tuple(x + i * 1e-6 for x in xs_), cws_, xy_)

    def mm_only(a):
        xs_, cws_, _ = a
        return sum(jnp.sum((x @ cw).astype(jnp.float32))
                   for x, cw in zip(xs_, cws_))

    def mm_d2s(a):
        """matmul + depth-to-space per scale, NO cross-scale sum (each
        full-res map reduced immediately)."""
        xs_, cws_, _ = a
        tot = 0.0
        for x, cw, k in zip(xs_, cws_, ks):
            b, h, w, _ = x.shape
            y = (x @ cw).reshape(b, h, w, k, k, F)
            y = y.transpose(0, 1, 3, 2, 4, 5).reshape(b, h * k, w * k, F)
            tot = tot + jnp.sum(y.astype(jnp.float32))
        return tot

    def ph_only(a):
        xs_, cws_, _ = a
        ph = dsx._build_ph(xs_, cws_, bias_fused, ks, F)
        return jnp.sum(ph.astype(jnp.float32))

    def ph_sum_dense(a):
        """dense full-res accumulation (the dense head's map build)."""
        xs_, cws_, _ = a
        total = None
        for x, cw, k in zip(xs_, cws_, ks):
            b, h, w, _ = x.shape
            y = (x @ cw).reshape(b, h, w, k, k, F)
            y = y.transpose(0, 1, 3, 2, 4, 5).reshape(b, h * k, w * k, F)
            total = y if total is None else total + y
        return jnp.sum(total.astype(jnp.float32))

    scan_time('mm_only', mm_only, args, pb)
    scan_time('mm_d2s', mm_d2s, args, pb)
    scan_time('ph_only', ph_only, args, pb)
    scan_time('ph_sum_dense', ph_sum_dense, args, pb)


if __name__ == '__main__':
    if len(sys.argv) > 1 and sys.argv[1] == 'decompose':
        decompose()
    else:
        main()
