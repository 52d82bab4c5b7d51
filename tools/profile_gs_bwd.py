"""Scan-timed grid-sample BACKWARD cost at the real LI-Fusion shapes (B4),
plus scatter-add reformulations.

The subtree attribution (tools/profile_bwd_subtrees.py) puts the whole
train-step backward excess in the image tower (grad wrt img_block0:
131 ms/iter vs 30.5 ms fwd-only). The five feature_gather calls
(backbone.py:70,109) backprop a scatter-add into the image maps; this
harness isolates that cost per fusion level and times alternatives:

  cur     — shipped _gs_bwd: vmapped zeros.at[flat].add(val)
  sorted  — argsort flat ids, permute vals, add(indices_are_sorted=True)
  runsum  — sort + cumsum run-boundary sums + unique sorted scatter
"""
import os
import sys
import time

sys.path.insert(0, os.getcwd())

import numpy as np

K = 11


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


def corners(xy_norm, H, W):
    import jax.numpy as jnp
    x = (xy_norm[..., 0] + 1.0) * 0.5 * (W - 1)
    y = (xy_norm[..., 1] + 1.0) * 0.5 * (H - 1)
    xs = jnp.clip(jnp.floor(x), 0, max(W - 2, 0)).astype(jnp.int32)
    ys = jnp.clip(jnp.floor(y), 0, max(H - 2, 0)).astype(jnp.int32)
    flats, ws = [], []
    for i in range(2):
        for j in range(2):
            wy = jnp.maximum(0.0, 1.0 - jnp.abs(y - (ys + i)))
            wx = jnp.maximum(0.0, 1.0 - jnp.abs(x - (xs + j)))
            flats.append((ys + i) * W + (xs + j))
            ws.append(wy * wx)
    return jnp.concatenate(flats, 1), jnp.concatenate(ws, 1)


def bwd_cur(flat, w, g, H, W):
    import jax
    import jax.numpy as jnp
    val = w[..., None] * jnp.concatenate([g] * 4, axis=1).astype(jnp.float32)
    C = val.shape[-1]
    df = jax.vmap(lambda fl, v: jnp.zeros((H * W, C), jnp.float32)
                  .at[fl].add(v))(flat, val)
    return jnp.sum(df)


def bwd_sorted(flat, w, g, H, W):
    import jax
    import jax.numpy as jnp
    val = w[..., None] * jnp.concatenate([g] * 4, axis=1).astype(jnp.float32)
    C = val.shape[-1]
    order = jnp.argsort(flat, axis=1)
    sf = jnp.take_along_axis(flat, order, 1)
    sv = jnp.take_along_axis(val, order[..., None], 1)
    df = jax.vmap(lambda fl, v: jnp.zeros((H * W, C), jnp.float32)
                  .at[fl].add(v, indices_are_sorted=True))(sf, sv)
    return jnp.sum(df)


def bwd_runsum(flat, w, g, H, W):
    import jax
    import jax.numpy as jnp
    val = w[..., None] * jnp.concatenate([g] * 4, axis=1).astype(jnp.float32)
    C = val.shape[-1]
    M = flat.shape[1]
    order = jnp.argsort(flat, axis=1)
    sf = jnp.take_along_axis(flat, order, 1)
    sv = jnp.take_along_axis(val, order[..., None], 1)
    csum = jnp.cumsum(sv, axis=1)
    is_last = jnp.concatenate(
        [sf[:, 1:] != sf[:, :-1], jnp.ones_like(sf[:, :1], bool)], 1)
    # csum at the previous run's last slot (0 where none)
    pos = jnp.arange(M)
    prev_last = jnp.concatenate(
        [jnp.full_like(sf[:, :1], -1),
         jax.lax.cummax(jnp.where(is_last, pos, -1), axis=1)[:, :-1]], 1)
    prev_sum = jnp.where(
        (prev_last >= 0)[..., None],
        jnp.take_along_axis(csum, jnp.maximum(prev_last, 0)[..., None], 1),
        0.0)
    runs = csum - prev_sum
    rows = jnp.where(is_last, sf, H * W)  # dumped (mode=drop)
    df = jax.vmap(lambda r, v: jnp.zeros((H * W, C), jnp.float32)
                  .at[r].add(v, indices_are_sorted=True, unique_indices=True,
                             mode='drop'))(rows, runs)
    return jnp.sum(df)


def bwd_split(flat, w, g, H, W):
    """One scatter per corner: 4 x N-update scatters instead of one 4N."""
    import jax
    import jax.numpy as jnp
    N = g.shape[1]
    C = g.shape[-1]
    gf = g.astype(jnp.float32)
    df = jnp.zeros((flat.shape[0], H * W, C), jnp.float32)
    for c in range(4):
        fl = flat[:, c * N:(c + 1) * N]
        v = w[:, c * N:(c + 1) * N, None] * gf
        df = jax.vmap(lambda d, fl_, v_: d.at[fl_].add(v_))(df, fl, v)
    return jnp.sum(df)


def bwd_chunk(flat, w, g, H, W, chunk=65536):
    """Scatters of at most `chunk` updates each (probe the U-scaling knee)."""
    import jax
    import jax.numpy as jnp
    val = w[..., None] * jnp.concatenate([g] * 4, axis=1).astype(jnp.float32)
    C = val.shape[-1]
    M = flat.shape[1]
    df = jnp.zeros((flat.shape[0], H * W, C), jnp.float32)
    for s in range(0, M, chunk):
        df = jax.vmap(lambda d, fl_, v_: d.at[fl_].add(v_))(
            df, flat[:, s:s + chunk], val[:, s:s + chunk])
    return jnp.sum(df)


def main():
    import jax
    import jax.numpy as jnp

    B = 4
    kr = jax.random.PRNGKey(0)
    shapes = [
        ('fusion0  192x640x64  N4096', 192, 640, 64, 4096),
        ('fusion1  96x320x128  N1024', 96, 320, 128, 1024),
        ('final    384x1280x32 N16384', 384, 1280, 32, 16384),
    ]
    which = sys.argv[1:] or ['cur', 'sorted', 'runsum']
    fns = {'cur': bwd_cur, 'sorted': bwd_sorted, 'runsum': bwd_runsum,
           'split': bwd_split, 'chunk16k': lambda *a: bwd_chunk(*a, chunk=16384),
           'chunk8k': lambda *a: bwd_chunk(*a, chunk=8192)}

    for label, H, W, C, N in shapes:
        xy = jax.jit(lambda k: jax.random.uniform(
            k, (B, N, 2), jnp.float32, -0.98, 0.98))(kr)
        g = jax.jit(lambda k: jax.random.normal(
            k, (B, N, C), jnp.float32).astype(jnp.bfloat16))(kr)
        flat, wgt = jax.jit(lambda a: corners(a, H, W))(xy)
        # numeric agreement check (tiny slice, on first variant pair)
        for name in which:
            scan_time(f'{label} [{name}]', lambda f_, w_, g_:
                      fns[name](f_, w_, g_, H, W),
                      lambda a, i: (a[0], a[1], a[2] + i.astype(jnp.bfloat16) * 1e-3),
                      flat, wgt, g)


if __name__ == '__main__':
    main()
