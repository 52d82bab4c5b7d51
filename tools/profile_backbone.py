"""Bisect the RPN backbone cost on the real chip."""
import os, sys, time
sys.path.insert(0, os.getcwd())
import numpy as np

def timeit(name, fn, *args, n=5):
    import jax
    r = fn(*args); np.asarray(jax.tree_util.tree_leaves(r)[0])
    t0 = time.time()
    for _ in range(n):
        r = fn(*args); np.asarray(jax.tree_util.tree_leaves(r)[0])
    print(f'{name}: {(time.time()-t0)/n*1000:.1f} ms', flush=True)

import jax, jax.numpy as jnp
from flax import linen as nn
from __graft_entry__ import _full_batch, _full_config
from epnet_tpu.models.pointnet2 import SAModuleMSG, FPModule
from epnet_tpu.models.fusion import ImageBlock, DeConvUp, feature_gather
from epnet_tpu.ops import pointops
from epnet_tpu.ops.fps_pallas import furthest_point_sample_pallas

cfg = _full_config()
B = 4
batch = _full_batch(cfg, batch_size=B)
db = jax.device_put(batch)
sa = cfg.RPN.SA_CONFIG

class PointStream(nn.Module):
    with_fp: bool = True
    @nn.compact
    def __call__(self, pts):
        xyz, feats = pts[..., 0:3], None
        l_xyz, l_feats = [xyz], [feats]
        for i in range(4):
            nxyz, nfeats, _ = SAModuleMSG(npoint=sa.NPOINTS[i], radii=sa.RADIUS[i],
                nsamples=sa.NSAMPLE[i], mlps=sa.MLPS[i], name=f'sa{i}')(l_xyz[i], l_feats[i])
            l_xyz.append(nxyz); l_feats.append(nfeats)
        if self.with_fp:
            fps = [FPModule(mlp=cfg.RPN.FP_MLPS[k], name=f'fp{k}') for k in range(4)]
            for i in range(-1, -5, -1):
                l_feats[i-1] = fps[i](l_xyz[i-1], l_xyz[i], l_feats[i-1], l_feats[i])
            return jnp.sum(l_feats[0])
        return jnp.sum(l_feats[-1])

class ImgStream(nn.Module):
    @nn.compact
    def __call__(self, img):
        acc = 0.0
        imgs = [img]
        for i in range(4):
            x = ImageBlock(cfg.LI_FUSION.IMG_CHANNELS[i+1], name=f'b{i}')(imgs[-1])
            imgs.append(x)
        ups = [DeConvUp(16, cfg.LI_FUSION.DeConv_Kernels[i], name=f'd{i}')(imgs[i+1]) for i in range(4)]
        cat = jnp.concatenate(ups, -1)
        return jnp.sum(cat)

ps_nofp = PointStream(with_fp=False)
v1 = jax.jit(lambda r, b: ps_nofp.init(r, b))(jax.random.PRNGKey(0), db['pts_input'])
timeit('point stream SA only', jax.jit(lambda v, b: ps_nofp.apply(v, b)), v1, db['pts_input'])

ps = PointStream(with_fp=True)
v2 = jax.jit(lambda r, b: ps.init(r, b))(jax.random.PRNGKey(0), db['pts_input'])
timeit('point stream SA+FP', jax.jit(lambda v, b: ps.apply(v, b)), v2, db['pts_input'])

ims = ImgStream()
v3 = jax.jit(lambda r, b: ims.init(r, b))(jax.random.PRNGKey(0), db['img'])
timeit('image stream (blocks+deconv)', jax.jit(lambda v, b: ims.apply(v, b)), v3, db['img'])

# fps alone at all stages
@jax.jit
def all_fps(pts):
    xyz = pts[..., :3]
    a = furthest_point_sample_pallas(xyz, 4096)
    x1 = pointops.gather_points(xyz, a)
    b = furthest_point_sample_pallas(x1, 1024)
    x2 = pointops.gather_points(x1, b)
    c = furthest_point_sample_pallas(x2, 256)
    x3 = pointops.gather_points(x2, c)
    d = furthest_point_sample_pallas(x3, 64)
    return jnp.sum(d) + jnp.sum(x3)
timeit('fps all 4 stages', all_fps, db['pts_input'])

@jax.jit
def all_bq(pts):
    xyz = pts[..., :3]
    acc = 0
    cur = xyz
    for i in range(4):
        nxt = cur[:, :sa.NPOINTS[i]]
        for r, s in zip(sa.RADIUS[i], sa.NSAMPLE[i]):
            acc += jnp.sum(pointops.ball_query(r, s, cur, nxt))
        cur = nxt
    return acc
timeit('ball query all stages', all_bq, db['pts_input'])
