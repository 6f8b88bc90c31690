"""Capture (or compare) one _frame_step output bitwise, CPU, fixed key."""
import sys
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np
import jax.numpy as jnp
from icra20_hand_object_pose_tpu.datasets import (
    default_object_pose, hand_base_for_grasp, render_frame_fast)
from icra20_hand_object_pose_tpu.models import Estimator, ObjectModel, make_t42_hand
from icra20_hand_object_pose_tpu.utils import meshio
from icra20_hand_object_pose_tpu.utils.config import (
    CameraIntrinsics, EstimatorConfig, PsoConfig)

cam = CameraIntrinsics(width=160, height=120, fx=140.0, fy=140.0, cx=80.0, cy=60.0)
cfg = EstimatorConfig(camera=cam, scene_points=512, render_size=120,
                      pso=PsoConfig(particles=64, iters=4))
mesh = meshio.make_test_object("box")
hand = make_t42_hand()
obj = ObjectModel(mesh, model_points=512, render_points=512)
pose_gt = default_object_pose()
hb = hand_base_for_grasp(pose_gt)
hq = np.asarray([0.45, 0.45], np.float32)
depth = jnp.asarray(render_frame_fast(mesh, pose_gt, hand, hb, hq, cam,
                                      noise_sigma=0.001,
                                      rng=np.random.default_rng(7)))
est = Estimator(obj, hand, cfg)
outs = {}
for mode in ("track", "init"):
    out = est.estimate(depth, jnp.asarray(pose_gt), jnp.asarray(hb),
                       jnp.asarray(hq), key=jax.random.key(3), mode=mode)
    outs[f"{mode}_pose"] = np.asarray(out.pose)
    outs[f"{mode}_fitness"] = np.asarray(out.fitness)
    outs[f"{mode}_coverage"] = np.asarray(out.coverage)

path = "/tmp/bitwise_ref.npz"
if sys.argv[1:] and sys.argv[1] == "check":
    ref = np.load(path)
    ok = True
    for k, v in outs.items():
        same = np.array_equal(ref[k], v)
        print(f"{k}: {'BITWISE OK' if same else 'MISMATCH'}")
        if not same:
            print("  ref", ref[k].ravel()[:4], "new", v.ravel()[:4])
            ok = False
    sys.exit(0 if ok else 1)
else:
    np.savez(path, **outs)
    print("saved", path, {k: v.shape for k, v in outs.items()})
