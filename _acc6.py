import jax, jax.numpy as jnp, numpy as np
from icra20_hand_object_pose_tpu.datasets import SyntheticSequenceConfig, generate_sequence
from icra20_hand_object_pose_tpu.models import Estimator, Tracker, ObjectModel, make_t42_hand
from icra20_hand_object_pose_tpu.evaluation import evaluate_trajectory
from icra20_hand_object_pose_tpu.utils import meshio
from icra20_hand_object_pose_tpu.utils.config import CameraIntrinsics, EstimatorConfig
cam = CameraIntrinsics(width=640, height=480, fx=570.0, fy=570.0, cx=320.0, cy=240.0)
hand = make_t42_hand()
cfg = EstimatorConfig(camera=cam)
for shape in ("box", "cylinder"):
    mesh = meshio.make_test_object(shape)
    obj = ObjectModel(mesh)
    frames = generate_sequence(mesh, hand, SyntheticSequenceConfig(
        n_frames=4, camera=cam, noise_sigma=0.001, dropout=0.02, seed=3))
    tr = Tracker(Estimator(obj, hand, cfg))
    est = [np.asarray(tr.step(jnp.asarray(f.depth), jnp.asarray(f.hand_base), jnp.asarray(f.hand_q)).pose) for f in frames]
    s = evaluate_trajectory(est, [f.pose_gt for f in frames], np.asarray(obj.model_pts), obj.diameter, mesh=mesh)
    print(f"{shape}: ADD-S={s.add_s_mean*1000:.2f}mm trans={s.trans_err_mean*1000:.2f}mm", flush=True)
