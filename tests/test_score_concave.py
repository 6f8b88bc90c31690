"""Concave-geometry validation of the point-mode scorer (VERDICT r1 item 2).

The hot scoring path (ops/score.compare_points) approximates z-buffer
visibility by back-face culling. On convex shapes the two are identical;
on concave shapes (L-bracket, mug cavity) a front-facing sample can be
hidden behind another part of the object. These tests pin down, against
the exact-z-buffer pixel mode and against true pose error, that the
approximation does not corrupt the fitness field:

  - self-occluded front-facing samples project BEHIND the observed
    occluding surface (diff > tau), so they dilute fitness ("counted, no
    support") rather than triggering the wrong-side penalty;
  - measured (this file): point-vs-pixel rank correlation >0.8 at swarm
    sigma, point-mode fitness ranks poses by true error BETTER than
    pixel mode (splat quantization noise), and point-mode argmax picks
    exact GT on every concave shape.
"""
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.stats import spearmanr

from icra20_hand_object_pose_tpu.datasets import synthetic
from icra20_hand_object_pose_tpu.models import (
    Estimator, ObjectModel, Tracker, make_t42_hand,
)
from icra20_hand_object_pose_tpu.ops.pso import score_particles
from icra20_hand_object_pose_tpu.utils import meshio, se3
from icra20_hand_object_pose_tpu.utils.config import (
    CameraIntrinsics, EstimatorConfig, HandConfig, IcpConfig, PsoConfig,
    ScoreConfig, TrackerConfig,
)

CAM = CameraIntrinsics(fx=140.0, fy=140.0, cx=80.0, cy=60.0, width=160, height=120)


def _score_setup(kind: str, P: int, rot_sigma: float, trans_sigma: float):
    """Exact-raster observed frame of a tilted object + a particle cloud
    around GT; returns (poses, point fitness, pixel fitness, ADD err [P])."""
    mesh = meshio.make_test_object(kind)
    obj = ObjectModel(mesh, model_points=512, render_points=1024)
    # tilt so the concavity is partially visible (cavity self-occlusion on)
    tilt = np.asarray(
        se3.se3_exp(jnp.asarray([0.9, 0.3, 0.0, 0.0, 0.0, 0.0], jnp.float32))
    )
    pose_gt = (synthetic.default_object_pose(0.45) @ tilt).astype(np.float32)
    depth = synthetic.render_frame(
        mesh, pose_gt, None, np.eye(4, dtype=np.float32), np.zeros(2, np.float32),
        CAM, noise_sigma=0.0,
    )
    dj = jnp.asarray(depth)
    poses = se3.perturb_pose(
        jax.random.key(0), jnp.asarray(pose_gt), rot_sigma, trans_sigma,
        shape=(P,),
    )
    poses = poses.at[0].set(jnp.asarray(pose_gt))
    common = dict(
        render_pts=obj.render_pts, render_normals=obj.render_normals,
        render_w=obj.render_w, observed_depth=dj, observed_valid=dj > 0,
        hand_depth=jnp.full(depth.shape, jnp.inf, jnp.float32),
        fx=CAM.fx, fy=CAM.fy, cx=CAM.cx, cy=CAM.cy,
        height=CAM.height, width=CAM.width, splat_radius=1,
    )
    f_pt, _ = jax.jit(
        partial(score_particles, score_cfg=ScoreConfig(mode="point"), **common)
    )(poses)
    f_px, _ = jax.jit(
        partial(score_particles, score_cfg=ScoreConfig(mode="pixel"), **common)
    )(poses)
    dense, _ = mesh.sample_surface(2048, seed=5)
    Pg = np.asarray(poses)
    a = dense @ Pg[:, :3, :3].transpose(0, 2, 1) + Pg[:, None, :3, 3]
    b = dense @ pose_gt[:3, :3].T + pose_gt[:3, 3]
    err = np.linalg.norm(a - b[None], axis=-1).mean(-1)
    return np.asarray(f_pt), np.asarray(f_px), err


@pytest.mark.parametrize("kind", ["lbracket", "mug"])
def test_point_vs_pixel_rank_agreement(kind):
    """At swarm-search sigma the two scoring modes must rank a particle
    cloud consistently (the point mode replaces the z-buffer in the hot
    path — it must drive the swarm toward the same basin)."""
    f_pt, f_px, err = _score_setup(kind, P=96, rot_sigma=0.08, trans_sigma=0.01)
    rho = spearmanr(f_pt, f_px).statistic
    assert rho > 0.8, f"{kind}: point-vs-pixel rank corr {rho:.3f}"
    # and both must broadly rank by true pose error
    assert spearmanr(f_pt, -err).statistic > 0.5
    assert spearmanr(f_px, -err).statistic > 0.4


@pytest.mark.parametrize("kind", ["lbracket", "tee", "mug"])
def test_point_mode_peaks_at_gt_on_concave(kind):
    """Self-occlusion must not move the fitness optimum: with exact GT in
    the cloud, point-mode argmax must select it, and at polish sigma the
    fitness ordering must follow true pose error closely."""
    f_pt, _, err = _score_setup(kind, P=96, rot_sigma=0.02, trans_sigma=0.0025)
    assert np.argmax(f_pt) == 0, (
        f"{kind}: best particle err {err[np.argmax(f_pt)]*1000:.2f}mm"
    )
    rho = spearmanr(f_pt, -err).statistic
    assert rho > 0.7, f"{kind}: fine-sigma rank-vs-error corr {rho:.3f}"


def test_tracking_concave_mug():
    """Full pipeline on the hardest concave shape, hand occlusion on
    (BASELINE config 4 semantics): tracking must hold single-digit-mm
    ADD-S through the sequence."""
    cfg = EstimatorConfig(
        camera=CAM,
        icp=IcpConfig(iters=10, max_corresp_dist=0.05),
        pso=PsoConfig(particles=32, iters=4, rot_sigma=0.10, trans_sigma=0.012,
                      icp_every=1, icp_iters_inner=4, elite_frac=0.25),
        hand=HandConfig(config_samples=4),
        tracker=TrackerConfig(reinit_particles=64),
        scene_points=768, model_points=256, render_size=60, depth_min=0.05,
    )
    mesh = meshio.make_test_object("mug")
    obj = ObjectModel(mesh, model_points=256, render_points=512)
    hand = make_t42_hand(points_per_link=128)
    frames = synthetic.generate_sequence(
        mesh, hand,
        synthetic.SyntheticSequenceConfig(
            n_frames=3, camera=CAM, noise_sigma=0.0008, dropout=0.01, seed=3,
            step_rot_deg=2.0, step_trans=0.003,
        ),
    )
    tracker = Tracker(Estimator(obj, hand, cfg), seed=0)
    dense, _ = mesh.sample_surface(4096, seed=123)
    errs = []
    for f in frames:
        out = tracker.step(
            jnp.asarray(f.depth), jnp.asarray(f.hand_base), jnp.asarray(f.hand_q)
        )
        from icra20_hand_object_pose_tpu.evaluation import add_s_error
        errs.append(add_s_error(np.asarray(out.pose), f.pose_gt, dense))
    assert errs[-1] < 0.010, [round(e * 1000, 2) for e in errs]
