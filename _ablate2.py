import time, dataclasses, jax, jax.numpy as jnp, numpy as np
from icra20_hand_object_pose_tpu.datasets import default_object_pose, hand_base_for_grasp, render_frame_fast
from icra20_hand_object_pose_tpu.models import Estimator, ObjectModel, make_t42_hand
from icra20_hand_object_pose_tpu.utils import meshio
from icra20_hand_object_pose_tpu.utils.config import CameraIntrinsics, EstimatorConfig, PsoConfig

cam = CameraIntrinsics(width=640, height=480, fx=570.0, fy=570.0, cx=320.0, cy=240.0)
mesh = meshio.make_test_object("box")
hand = make_t42_hand()
obj = ObjectModel(mesh, model_points=1024, render_points=2048)
pose_gt = default_object_pose(); hb = hand_base_for_grasp(pose_gt)
hq = np.asarray([0.45, 0.45], np.float32)
depth = jnp.asarray(render_frame_fast(mesh, pose_gt, hand, hb, hq, cam, noise_sigma=0.001))
prev = jnp.asarray(pose_gt); hbj = jnp.asarray(hb); hqj = jnp.asarray(hq)

def bench(tag, cfg, nn_fn=None, n=6):
    est = Estimator(obj, hand, cfg, nn_fn=nn_fn)
    out = est.estimate(depth, prev, hbj, hqj, key=jax.random.key(0), mode="track")
    _ = np.asarray(out.pose)  # force compile+run
    t0 = time.time()
    for i in range(n):
        out = est.estimate(depth, prev, hbj, hqj, key=jax.random.key(i+1), mode="track")
    _ = np.asarray(out.pose)
    dt = (time.time()-t0)/n
    print(f"{tag}: {dt*1000:.0f}ms/frame hyp/s={cfg.pso.particles*cfg.pso.iters/dt:.0f} fit={float(out.fitness):.3f}", flush=True)

base = EstimatorConfig(camera=cam, scene_points=2048, render_size=120,
    pso=PsoConfig(particles=512, iters=10))
bench("A full", base)
bench("B no-inner-icp", dataclasses.replace(base, pso=dataclasses.replace(base.pso, icp_every=0)))
bench("C icp-but-1-inner", dataclasses.replace(base, pso=dataclasses.replace(base.pso, icp_iters_inner=1)))
