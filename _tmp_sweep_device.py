import time, numpy as np, jax, jax.numpy as jnp
from icra20_hand_object_pose_tpu.utils.jaxcache import enable_compilation_cache
enable_compilation_cache()
from icra20_hand_object_pose_tpu.datasets import (
    default_object_pose, hand_base_for_grasp, render_frame_fast)
from icra20_hand_object_pose_tpu.models import ObjectModel, make_t42_hand
from icra20_hand_object_pose_tpu.parallel import LibrarySweep
from icra20_hand_object_pose_tpu.utils import meshio
from icra20_hand_object_pose_tpu.utils.config import (
    CameraIntrinsics, EstimatorConfig, PsoConfig)

cam = CameraIntrinsics(width=640, height=480, fx=570.0, fy=570.0, cx=320.0, cy=240.0)
cfg = EstimatorConfig(camera=cam, scene_points=2048,
                      pso=PsoConfig(particles=128, iters=10))
shapes = ["box", "cylinder", "sphere", "ellipsoid"]
meshes = [meshio.make_test_object(shapes[i % 4]) for i in range(8)]
hand = make_t42_hand()
objs = [ObjectModel(m, seed=i) for i, m in enumerate(meshes)]
sweep = LibrarySweep(objs, hand, cfg)
pose_gt = default_object_pose()
hb = hand_base_for_grasp(pose_gt)
hq = np.asarray([0.45, 0.45], np.float32)
depths = jnp.stack([jnp.asarray(render_frame_fast(m, pose_gt, hand, hb, hq, cam,
                    noise_sigma=0.001)) for m in meshes])
hbs = jnp.tile(jnp.asarray(hb)[None], (8, 1, 1))
hqs = jnp.tile(jnp.asarray(hq)[None], (8, 1))
st = sweep.init_state()
st, res = sweep.step(st, depths, hbs, hqs); _ = np.asarray(res.poses)
st, res = sweep.step(st, depths, hbs, hqs); _ = np.asarray(res.poses)
# pure device: queue N identical track programs, fetch last
key, kt, ki, pt, pi, ni = sweep._prep_jit(st)
out = sweep._run(kt, depths, pt, hbs, hqs, "track"); _ = np.asarray(out.pose)
for rep in range(3):
    t0 = time.perf_counter()
    for _ in range(5):
        out = sweep._run(kt, depths, pt, hbs, hqs, "track")
    _ = np.asarray(out.pose)
    print(f"device-only sweep program: {(time.perf_counter()-t0)/5*1e3:.1f} ms")
# full step loop (warm the pipeline first)
for _ in range(13):
    st, res = sweep.step(st, depths, hbs, hqs)
_ = np.asarray(res.poses)
for rep in range(3):
    t0 = time.perf_counter()
    for _ in range(5):
        st, res = sweep.step(st, depths, hbs, hqs)
    _ = np.asarray(res.poses)
    print(f"full step: {(time.perf_counter()-t0)/5*1e3:.1f} ms")
