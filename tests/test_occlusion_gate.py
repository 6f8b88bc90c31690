"""Occlusion-robustness regression gate (VERDICT r3 item 2).

The TPU-measured headline curve (scripts/eval_occlusion.py, VGA, 512p,
2 seeds x 8 frames, 2026-08-19) — tracked ADD-S vs MEASURED occlusion
(object pixels hidden by hand geometry or its segmentation drop band):

    asym: 18% 1.82mm | 26% 1.98 | 36% 2.12 | 47% 2.34 | 55% 1.89 | 63% 1.83
    box:   0% 2.23mm | 16% 2.23 | 39% 2.38 | 66% 2.21 | 68% 2.38

i.e. accuracy is occlusion-FLAT to ~2/3 of the object hidden, with zero
watchdog re-inits and coverage >= 0.51 (threshold 0.05 never near).
This gate pins the heaviest level at reduced res so a regression in the
occlusion machinery (neutral class, occluder masks, config selection)
fails the suite.
"""
import numpy as np
import jax
import jax.numpy as jnp

from icra20_hand_object_pose_tpu.datasets import render_frame_fast
from icra20_hand_object_pose_tpu.evaluation import add_s_error
from icra20_hand_object_pose_tpu.models import (
    Estimator, ObjectModel, Tracker, make_t42_hand,
)
from icra20_hand_object_pose_tpu.utils import meshio, se3
from icra20_hand_object_pose_tpu.utils.config import (
    CameraIntrinsics, EstimatorConfig, PsoConfig, TrackerConfig,
)

CAM = CameraIntrinsics(width=320, height=240, fx=285.0, fy=285.0,
                       cx=160.0, cy=120.0)


def frontal_grasp_base(object_pose, theta_deg, offset=0.10):
    """Grasp approach rotated toward the camera (see
    scripts/eval_occlusion.py): theta=78 puts palm + both fingers
    between camera and object — ~55-65%% of the object hidden."""
    T = np.asarray(object_pose, np.float32)
    c = T[:3, 3]
    th = np.radians(theta_deg)
    z_h = np.array([np.cos(th), 0.0, np.sin(th)], np.float32)
    y_h = np.array([0.0, 1.0, 0.0], np.float32)
    x_h = np.cross(y_h, z_h).astype(np.float32)
    out = np.eye(4, dtype=np.float32)
    out[:3, :3] = np.stack([x_h, y_h, z_h], axis=1)
    out[:3, 3] = c - z_h * offset
    return out


def test_tracking_under_heavy_occlusion():
    cfg = EstimatorConfig(
        camera=CAM, scene_points=1024,
        pso=PsoConfig(particles=256, iters=10),
        tracker=TrackerConfig(reinit_particles=512),
    )
    mesh = meshio.make_test_object("asym")
    hand = make_t42_hand()
    obj = ObjectModel(mesh, model_points=1024, render_points=1024)
    dense, _ = mesh.sample_surface(8192, seed=123)
    hq = np.asarray([0.45, 0.45], np.float32)
    pose = np.eye(4, dtype=np.float32)
    pose[:3, 3] = [0.0, 0.0, 0.5]
    hb = frontal_grasp_base(pose, 78.0)
    est = Estimator(obj, hand, cfg)
    tracker = Tracker(est, seed=0)
    tracker.state = tracker.state._replace(
        pose=jnp.asarray(pose), initialized=jnp.asarray(True),
        fitness=jnp.asarray(1.0),
    )
    rng = np.random.default_rng(7000)
    key = jax.random.key(97)
    cur = pose
    errs, covs = [], []
    for f in range(4):
        key, k1 = jax.random.split(key)
        if f > 0:
            nxt = np.asarray(se3.perturb_pose(
                k1, jnp.asarray(cur), 0.05, 0.004)).astype(np.float32)
            hb = (nxt @ np.linalg.inv(cur) @ hb).astype(np.float32)
            cur = nxt
        dep = render_frame_fast(mesh, cur, hand, hb, hq, CAM,
                                noise_sigma=0.001, rng=rng)
        res = tracker.step(jnp.asarray(dep), jnp.asarray(hb),
                           jnp.asarray(hq))
        covs.append(float(res.coverage))
        if f > 0:
            errs.append(add_s_error(np.asarray(res.pose), cur, dense))
    # VGA measured 1.89 mm at this level; reduced res carries ~2x
    # quantization — gate with margin
    assert max(errs) * 1000 < 8.0, [round(e * 1e3, 2) for e in errs]
    # the watchdog must neither misfire (coverage above threshold) nor
    # be needed (no frame re-initialized)
    assert min(covs) > cfg.tracker.coverage_reinit_threshold, covs
