import time, jax, jax.numpy as jnp, numpy as np
from icra20_hand_object_pose_tpu.ops import render, score
from icra20_hand_object_pose_tpu.utils import se3

def timeit(fn, n=20, tag=""):
    out = fn(0); _ = np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0]
    t0 = time.time()
    for i in range(n): out = fn(i)
    _ = np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0]
    print(f"{tag}: {(time.time()-t0)/n*1000:.2f}ms", flush=True)

P, Nr, H, W = 512, 2048, 120, 160
key = jax.random.key(0)
pts = jax.random.uniform(jax.random.fold_in(key,0), (P, Nr, 3), minval=-0.1, maxval=0.1) + jnp.asarray([0,0,0.5])
w = jnp.ones((Nr,))
obs = jax.random.uniform(jax.random.fold_in(key,1), (H, W), minval=0.3, maxval=0.7)
valid = obs > 0.35
hand_depth = jnp.full((H, W), jnp.inf)

import functools
@functools.partial(jax.jit, static_argnames=("radius",))
def splat(pts, i, radius=1):
    return render.splat_depth_batched(pts + i*1e-6, w, fx=142.5, fy=142.5, cx=80., cy=60., height=H, width=W, radius=radius)

depths = splat(pts, 0)
timeit(lambda i: splat(pts, i, radius=1), tag="splat r=1 (9 scatters)")
timeit(lambda i: splat(pts, i, radius=0), tag="splat r=0 (1 scatter)")

@jax.jit
def score_only(d, i):
    t = score.compare_depth(d + i*1e-9, obs, valid, hand_depth)
    return t.fitness
timeit(lambda i: score_only(depths, i), tag="score [512,120,160]")

poses = jnp.tile(jnp.eye(4)[None], (P,1,1))
@jax.jit
def perturb(i):
    ks = jax.random.split(jax.random.fold_in(key, i), P)
    return jax.vmap(lambda kk, T: se3.perturb_pose(kk, T, 0.1, 0.01))(ks, poses)
timeit(lambda i: perturb(i), tag="perturb 512 poses")

fit = jax.random.normal(jax.random.fold_in(key,5), (P,))
@jax.jit
def resample(i):
    order = jnp.argsort(fit + i*1e-6)
    return order[:128]
timeit(lambda i: resample(i), tag="argsort 512")

mpts = jax.random.uniform(jax.random.fold_in(key,6), (P, Nr, 3))
@jax.jit
def xform(i):
    return se3.transform_points(poses, mpts[0] + i*1e-6)
timeit(lambda i: xform(i), tag="transform_points [512,2048]")
