"""Production-resolution accuracy eval on TPU: synthetic grasp sequences."""
import time, jax, jax.numpy as jnp, numpy as np
from icra20_hand_object_pose_tpu.datasets import SyntheticSequenceConfig, generate_sequence
from icra20_hand_object_pose_tpu.models import Estimator, Tracker, ObjectModel, make_t42_hand
from icra20_hand_object_pose_tpu.evaluation import evaluate_trajectory
from icra20_hand_object_pose_tpu.utils import meshio
from icra20_hand_object_pose_tpu.utils.config import CameraIntrinsics, EstimatorConfig

cam = CameraIntrinsics(width=640, height=480, fx=570.0, fy=570.0, cx=320.0, cy=240.0)
cfg = EstimatorConfig(camera=cam)   # production defaults: 512 particles
hand = make_t42_hand()

for shape in ("box", "cylinder", "ellipsoid"):
    mesh = meshio.make_test_object(shape)
    frames = generate_sequence(mesh, hand, SyntheticSequenceConfig(
        n_frames=6, camera=cam, noise_sigma=0.001, dropout=0.02, seed=3))
    obj = ObjectModel(mesh)
    tracker = Tracker(Estimator(obj, hand, cfg))
    est_poses, t0 = [], time.time()
    for f in frames:
        out = tracker.step(jnp.asarray(f.depth), jnp.asarray(f.hand_base), jnp.asarray(f.hand_q))
        est_poses.append(np.asarray(out.pose))
    dt = (time.time() - t0) / len(frames)
    s = evaluate_trajectory(est_poses, [f.pose_gt for f in frames],
                            np.asarray(obj.model_pts), obj.diameter)
    print(f"{shape}: {s}  ({dt*1000:.0f}ms/frame avg incl compile)", flush=True)
