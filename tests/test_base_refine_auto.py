"""Auto-armed hand-base refinement (VERDICT r4 item 5).

ONE default config must serve both calibration regimes:
  - exactly-calibrated reported base -> the margin-accept REJECTS the
    refinement winner (its agreement gain is only the score-space
    splat-floor overfit, measured <= +0.059) and the masks are built
    from the exact base;
  - miscalibrated base (3 deg / 5 mm extrinsic + wrong nominal q,
    realistic sensor) -> the search wins by > the margin and the
    accepted base cuts the hand-cloud error (measured r5: 16-32 mm ->
    9-22 mm on accepting draws).

Pinned at reduced res through the PUBLIC init path (est.estimate
mode='init') by checking registration success in both regimes with the
default HandConfig — no base_refine_iters, no --realistic knowledge.
Margin calibration data: scripts/calibrate_base_agree.py and the r5
measurement table in HandConfig.base_refine_auto's comment.
"""
import numpy as np
import jax
import jax.numpy as jnp

from icra20_hand_object_pose_tpu.datasets import (
    SensorModel, hand_base_for_grasp, render_frame,
)
from icra20_hand_object_pose_tpu.evaluation import add_s_error
from icra20_hand_object_pose_tpu.models import (
    Estimator, ObjectModel, make_t42_hand,
)
from icra20_hand_object_pose_tpu.utils import meshio, se3
from icra20_hand_object_pose_tpu.utils.config import (
    CameraIntrinsics, EstimatorConfig, PsoConfig, TrackerConfig,
)

CAM = CameraIntrinsics(width=320, height=240, fx=285.0, fy=285.0,
                       cx=160.0, cy=120.0)


def _run_trials(realistic: bool, n_trials: int = 4):
    cfg = EstimatorConfig(   # the ONE default config — no hand knobs
        camera=CAM, scene_points=1024,
        pso=PsoConfig(particles=256, iters=10),
        tracker=TrackerConfig(reinit_particles=512),
    )
    mesh = meshio.make_test_object("asym")
    obj = ObjectModel(mesh, model_points=1024, render_points=1024)
    hand = make_t42_hand()
    est = Estimator(obj, hand, cfg)
    dense, _ = mesh.sample_surface(4096, seed=123)
    hq = np.asarray([0.45, 0.45], np.float32)
    rng = np.random.default_rng(5)
    keys = jax.random.split(jax.random.key(11), n_trials)
    n_ok, errs = 0, []
    for t in range(n_trials):
        R = np.asarray(se3.random_rotation(jax.random.fold_in(keys[t], 1)))
        gt = np.eye(4, dtype=np.float32)
        gt[:3, :3] = R
        gt[:3, 3] = [rng.uniform(-0.05, 0.05), rng.uniform(-0.04, 0.04),
                     rng.uniform(0.42, 0.55)]
        hb = hand_base_for_grasp(gt)
        if realistic:
            cal = np.random.default_rng(900 + t)
            w = cal.normal(size=3)
            w = w / np.linalg.norm(w) * np.radians(3.0)
            v = cal.normal(size=3)
            v = v / np.linalg.norm(v) * 5e-3
            err_T = np.asarray(se3.se3_exp(jnp.asarray(
                np.concatenate([w, v]), jnp.float32)))
            hb_rep = (err_T @ hb).astype(np.float32)
            q_true = (hq + cal.choice([-0.15, 0.15])).astype(np.float32)
            sensor, noise = SensorModel(), 0.0
        else:
            hb_rep, q_true, sensor, noise = hb, hq, None, 0.001
        depth = render_frame(mesh, gt, hand, hb, q_true, CAM,
                             noise_sigma=noise,
                             rng=np.random.default_rng(70 + t),
                             sensor=sensor)
        out = est.estimate(jnp.asarray(depth), jnp.eye(4),
                           jnp.asarray(hb_rep), jnp.asarray(hq),
                           key=keys[t], mode="init")
        e = add_s_error(np.asarray(out.pose), gt, dense)
        errs.append(e)
        n_ok += e < 0.1 * obj.diameter
    return n_ok, n_trials, errs


def test_default_config_calibrated_regime():
    n_ok, n, errs = _run_trials(realistic=False)
    assert n_ok == n, [round(e * 1000, 1) for e in errs]


def test_default_config_miscalibrated_regime():
    # >= 3/4 at reduced res (the VGA realistic bench target is the
    # driver-recorded number; this CI gate catches the auto-arm path
    # breaking, not its exact rate)
    n_ok, n, errs = _run_trials(realistic=True)
    assert n_ok >= n - 1, [round(e * 1000, 1) for e in errs]
