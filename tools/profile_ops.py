import numpy as np, jax, jax.numpy as jnp, time, functools

def timeit(name, fn, *args, n=3):
    r = fn(*args); np.asarray(jax.tree_util.tree_leaves(r)[0])  # warm
    t0 = time.time()
    for _ in range(n):
        r = fn(*args)
        np.asarray(jax.tree_util.tree_leaves(r)[0])
    print(f'{name}: {(time.time()-t0)/n*1000:.1f} ms')

rng = np.random.RandomState(0)
B, N = 4, 16384
xyz = rng.randn(B, N, 3).astype(np.float32) * 10

from epnet_tpu.ops import pointops, nms
from epnet_tpu.ops.roipool3d import roipool3d
from epnet_tpu.ops.fps_pallas import furthest_point_sample_pallas

timeit('fps 16384->4096', functools.partial(furthest_point_sample_pallas, npoint=4096), xyz)
new_xyz = xyz[:, :4096]
bq = jax.jit(functools.partial(pointops.ball_query, 0.5, 32))
timeit('ball_query s1 (M=4096,S=32)', bq, xyz, new_xyz)
tn = jax.jit(pointops.three_nn)
timeit('three_nn (16384 vs 4096)', tn, xyz, new_xyz)

feats = rng.randn(B, N, 128).astype(np.float32)
gp = jax.jit(pointops.group_points)
idx = rng.randint(0, N, (B, 4096, 32)).astype(np.int32)
timeit('group_points (4096x32x128)', gp, feats, idx)

# NMS at train scale: 6300 candidates
bev = rng.randn(6300, 5).astype(np.float32)
scores = rng.rand(6300).astype(np.float32)
nm = jax.jit(functools.partial(nms.nms_bev, thresh=0.85, max_keep=358, rotated=False))
timeit('nms 6300 normal', nm, bev, scores)

# roipool eval scale
boxes3d = np.concatenate([rng.uniform(-20,20,(B,100,1)), rng.uniform(0,2,(B,100,1)), rng.uniform(0,60,(B,100,1)), rng.uniform(1.4,1.8,(B,100,3)), rng.uniform(-3,3,(B,100,1))],axis=2).astype(np.float32)
rp = jax.jit(functools.partial(roipool3d, pool_extra_width=0.2, sampled_pt_num=512))
timeit('roipool B4 M100 S512', rp, xyz, feats, boxes3d)
