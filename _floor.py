import time, jax, jax.numpy as jnp, numpy as np, functools
from icra20_hand_object_pose_tpu.datasets import default_object_pose, hand_base_for_grasp, render_frame_fast
from icra20_hand_object_pose_tpu.models import make_t42_hand
from icra20_hand_object_pose_tpu.ops import preprocess, render
from icra20_hand_object_pose_tpu.utils.config import CameraIntrinsics

cam = CameraIntrinsics(width=640, height=480, fx=570.0, fy=570.0, cx=320.0, cy=240.0)
hand = make_t42_hand()
pose = default_object_pose(); hb = hand_base_for_grasp(pose)
hq = np.asarray([0.45, 0.45], np.float32)
from icra20_hand_object_pose_tpu.utils import meshio
depth = jnp.asarray(render_frame_fast(meshio.make_test_object("box"), pose, hand, hb, hq, cam, noise_sigma=0.001))

def timeit(fn, n=20, tag=""):
    out = fn(0); _ = np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0]
    t0=time.time()
    for i in range(n): out = fn(i)
    _ = np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0]
    print(f"{tag}: {(time.time()-t0)/n*1000:.2f}ms", flush=True)

@jax.jit
def pre(key):
    return preprocess.preprocess_frame(key, depth, fx=cam.fx, fy=cam.fy,
        cx=cam.cx, cy=cam.cy, depth_min=0.1, depth_max=2.0, n_points=2048,
        render_factor=4)
timeit(lambda i: pre(jax.random.key(i)), tag="preprocess_frame VGA")

@jax.jit
def hand_splat(key, hb, hq):
    clouds = hand.sampled_clouds(key, hb, hq, 0.12, 8)
    flat = clouds.reshape(-1, 3)
    return render.splat_depth(flat, jnp.ones(flat.shape[0]),
        fx=cam.fx, fy=cam.fy, cx=cam.cx, cy=cam.cy,
        height=480, width=640, radius=2)
hbj, hqj = jnp.asarray(hb), jnp.asarray(hq)
timeit(lambda i: hand_splat(jax.random.key(i), hbj, hqj), tag="hand splat VGA r2 (8cfg x 1280pts)")

@jax.jit
def knn_seg(key, pts, hb, hq):
    clouds = hand.sampled_clouds(key, hb, hq, 0.12, 8)
    from icra20_hand_object_pose_tpu.ops import knn
    d2h = knn.pairwise_sqdist(pts, clouds.reshape(-1, 3))
    return jnp.min(d2h, axis=-1)
pts = jax.random.normal(jax.random.key(0), (2048, 3))
timeit(lambda i: knn_seg(jax.random.key(i), pts, hbj, hqj), tag="hand point segmentation")
