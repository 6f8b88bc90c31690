"""Second-order visibility (incumbent self-occlusion mask) gates.

VERDICT r4 item 2: the track program decides each render sample's
visibility ONCE per frame at the incumbent prior pose (splat + z-test,
estimator._search) and threads the frame-constant [Nr] mask through
every scoring tier (ops/pso, ops/score.compare_points).

Pinned here:
  1. EXACT-VISIBILITY ORACLE rank agreement >= 0.95 on the concave set:
     oracle fitness = compare_points with per-candidate visibility from
     an exact triangle raster at that candidate's pose (the true
     z-buffer). Measured r5 (96 candidates, swarm + fine sigma):
     masked point mode 0.980-0.997 on lbracket/tee/mug — the back-face
     approximation plus the incumbent mask carries the oracle's ranking.
  2. All-true mask is a bitwise plumbing NO-OP (fitness and coverage),
     so the mask path cannot silently change unmasked semantics.
  3. Denominator floor: a candidate whose facing set the mask culls to
     a sliver must NOT outrank the true pose on lucky sliver support
     (the r5 regression: tiny-config tracking 4.8 -> 58.9 mm before
     ScoreConfig.self_occ_count_floor).
"""
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.stats import spearmanr

from icra20_hand_object_pose_tpu.datasets import synthetic
from icra20_hand_object_pose_tpu.models.object_model import ObjectModel
from icra20_hand_object_pose_tpu.ops import render
from icra20_hand_object_pose_tpu.ops.pso import score_particles
from icra20_hand_object_pose_tpu.utils import meshio, se3
from icra20_hand_object_pose_tpu.utils.config import (
    CameraIntrinsics, ScoreConfig,
)

CAM = CameraIntrinsics(fx=140.0, fy=140.0, cx=80.0, cy=60.0,
                       width=160, height=120)
KW = dict(fx=CAM.fx, fy=CAM.fy, cx=CAM.cx, cy=CAM.cy,
          height=CAM.height, width=CAM.width)


def _incumbent_mask(obj, pose, margin=0.008, rot_sigma=0.0,
                    trans_sigma=0.0, n_union=0):
    """The estimator._search visibility test, standalone (kept in sync
    by this file's oracle gate — a drift shows up as lost rank corr).
    With n_union > 0 this is the shipped SEARCH-REGION union mask
    (incumbent + sigma-perturbed poses); n_union == 0 is the incumbent-
    only variant the r5 box regression ruled out for tracking."""
    poses = jnp.asarray(pose)[None]
    if n_union > 0:
        region = se3.perturb_pose(
            jax.random.key(7), jnp.tile(poses, (n_union, 1, 1)),
            rot_sigma, trans_sigma, shape=(n_union,))
        poses = jnp.concatenate([poses, region], axis=0)
    inc = se3.transform_points(poses, obj.render_pts)
    nrm = se3.rotate_vectors(poses, obj.render_normals)
    d = render.splat_depth_batched(inc, obj.render_w, radius=1, **KW)
    z = inc[..., 2]
    zs = jnp.where(z > 1e-6, z, 1.0)
    ui = jnp.clip(jnp.round(inc[..., 0] / zs * CAM.fx + CAM.cx
                            ).astype(jnp.int32), 0, CAM.width - 1)
    vi = jnp.clip(jnp.round(inc[..., 1] / zs * CAM.fy + CAM.cy
                            ).astype(jnp.int32), 0, CAM.height - 1)
    d_at = jnp.take_along_axis(
        d.reshape(d.shape[0], -1), vi * CAM.width + ui, axis=-1)
    ray = inc / jnp.maximum(
        jnp.linalg.norm(inc, axis=-1, keepdims=True), 1e-9)
    cosv = jnp.clip(-jnp.sum(nrm * ray, axis=-1), 1e-3, 1.0)
    tanv = jnp.sqrt(1.0 - cosv**2) / cosv
    vis = jnp.any(
        d_at >= z - (margin + 1.5 * (z / CAM.fx) * jnp.minimum(tanv, 4.0)),
        axis=0)
    return vis | jnp.any(tanv > 2.5, axis=0)  # grazing exemption


def _oracle_vis(mesh, poses, render_pts):
    """[P,N] exact per-candidate visibility: triangle raster per pose."""
    verts = jnp.asarray(mesh.vertices, jnp.float32)
    faces = jnp.asarray(mesh.faces, jnp.int32)
    outs = []
    for p in np.asarray(poses):
        vc = verts @ jnp.asarray(p[:3, :3].T) + jnp.asarray(p[:3, 3])
        zb = render.raster_depth(vc, faces, **KW)
        pts = se3.transform_points(jnp.asarray(p), render_pts)
        z = pts[..., 2]
        zs = jnp.where(z > 1e-6, z, 1.0)
        ui = jnp.clip(jnp.round(pts[..., 0] / zs * CAM.fx + CAM.cx
                                ).astype(jnp.int32), 0, CAM.width - 1)
        vi = jnp.clip(jnp.round(pts[..., 1] / zs * CAM.fy + CAM.cy
                                ).astype(jnp.int32), 0, CAM.height - 1)
        d_at = zb.reshape(-1)[vi * CAM.width + ui]
        outs.append(np.asarray(z <= d_at + 0.002))
    return jnp.asarray(np.stack(outs))


def _setup(kind, P, rot_sigma, trans_sigma):
    mesh = meshio.make_test_object(kind)
    obj = ObjectModel(mesh, model_points=512, render_points=1024)
    tilt = np.asarray(se3.se3_exp(
        jnp.asarray([0.9, 0.3, 0, 0, 0, 0], jnp.float32)))
    pose_gt = (synthetic.default_object_pose(0.45) @ tilt).astype(np.float32)
    depth = synthetic.render_frame(
        mesh, pose_gt, None, np.eye(4, dtype=np.float32),
        np.zeros(2, np.float32), CAM, noise_sigma=0.0)
    dj = jnp.asarray(depth)
    poses = se3.perturb_pose(jax.random.key(0), jnp.asarray(pose_gt),
                             rot_sigma, trans_sigma, shape=(P,))
    poses = poses.at[0].set(jnp.asarray(pose_gt))
    common = dict(
        render_pts=obj.render_pts, render_normals=obj.render_normals,
        render_w=obj.render_w, observed_depth=dj, observed_valid=dj > 0,
        hand_depth=jnp.full(depth.shape, jnp.inf, jnp.float32),
        splat_radius=1, **KW)
    return mesh, obj, pose_gt, poses, common


@pytest.mark.parametrize("kind", ["lbracket", "mug"])
def test_masked_rank_vs_exact_oracle(kind):
    mesh, obj, pose_gt, poses, common = _setup(kind, 64, 0.08, 0.01)
    sc = ScoreConfig(mode="point")
    score = jax.jit(partial(score_particles, score_cfg=sc, **common))
    # the SHIPPED mask: search-region union at the candidate spread
    f_m, _ = score(poses, sample_mask=_incumbent_mask(
        obj, pose_gt, rot_sigma=0.08, trans_sigma=0.01, n_union=6))
    f_or, _ = score(poses, sample_mask=_oracle_vis(
        mesh, poses, obj.render_pts))
    rho = spearmanr(np.asarray(f_m), np.asarray(f_or)).statistic
    assert rho >= 0.95, f"{kind}: masked-vs-oracle rank corr {rho:.3f}"
    assert int(np.argmax(np.asarray(f_m))) == 0


def test_all_true_mask_is_noop():
    _, obj, pose_gt, poses, common = _setup("tee", 48, 0.05, 0.008)
    sc = ScoreConfig(mode="point")
    score = jax.jit(partial(score_particles, score_cfg=sc, **common))
    f0, c0 = score(poses)
    f1, c1 = score(poses, sample_mask=jnp.ones(
        obj.render_pts.shape[0], bool))
    np.testing.assert_array_equal(np.asarray(f0), np.asarray(f1))
    np.testing.assert_array_equal(np.asarray(c0), np.asarray(c1))


def test_sliver_candidate_cannot_win():
    """A flipped candidate whose visible half the incumbent mask culls
    must stay below the true pose even if its surviving sliver matches:
    the denominator floor scales its fitness by the unmasked count."""
    _, obj, pose_gt, poses, common = _setup("tee", 8, 0.01, 0.001)
    # candidate 7 = 180-degree flip about the camera-vertical axis
    flip = np.asarray(se3.se3_exp(
        jnp.asarray([0.0, np.pi, 0, 0, 0, 0], jnp.float32)))
    poses = poses.at[7].set(jnp.asarray(
        (np.asarray(pose_gt) @ flip).astype(np.float32)))
    sc = ScoreConfig(mode="point")
    score = jax.jit(partial(score_particles, score_cfg=sc, **common))
    f, _ = score(poses, sample_mask=_incumbent_mask(obj, pose_gt))
    f = np.asarray(f)
    assert np.argmax(f) == 0, f
    assert f[7] < f[0], f
