#!/usr/bin/env python
"""Tracking accuracy vs finger-occlusion fraction.

The reference method's headline claim (ICRA 2020, arXiv:2003.03518) is
robustness of the pose estimate UNDER hand occlusion — its evaluation
reports pose accuracy against how much of the object the fingers hide.
This script reproduces that axis synthetically: the grasp geometry is
swept so the front finger covers an increasing fraction of the object's
visible silhouette, the occlusion fraction is MEASURED per sequence
(object pixels hidden by hand geometry in the rendered frame), and a
noisy tracked sequence is scored at each level.

Usage:
  python scripts/eval_occlusion.py [--shape asym] [--frames 8] [--seeds 2]

Prints one JSON line per occlusion level:
  {"occlusion_pct": ..., "adds_mm_tracked_mean": ..., ...}
"""
from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from icra20_hand_object_pose_tpu.utils.jaxcache import enable_compilation_cache  # noqa: E402
enable_compilation_cache()


def measured_occlusion(mesh, pose, hand, hb, hq, cam, segment_dist=0.008):
    """Fraction of the object's visible pixels hidden or dropped by the
    hand: hand surface in front of the object surface (occluded), or the
    object surface within segment_dist behind the hand (the preprocessing
    drop band — evidence the estimator must also do without)."""
    import jax.numpy as jnp
    from icra20_hand_object_pose_tpu.datasets import render_frame
    from icra20_hand_object_pose_tpu.ops import render

    d_obj = render_frame(mesh, pose, None, np.eye(4, dtype=np.float32),
                         np.zeros(2, np.float32), cam)
    hm = hand.merged_mesh(np.asarray(hq))
    hp, _ = hm.sample_surface(8192, seed=8)
    B = np.asarray(hb, np.float32)
    hp = hp @ B[:3, :3].T + B[:3, 3]
    d_hand = np.asarray(render.splat_depth(
        jnp.asarray(hp, jnp.float32), jnp.ones(hp.shape[0], jnp.float32),
        fx=cam.fx, fy=cam.fy, cx=cam.cx, cy=cam.cy,
        height=cam.height, width=cam.width, radius=2,
    ))
    obj_px = d_obj > 0
    hand_px = np.isfinite(d_hand)
    occ = obj_px & hand_px & (d_hand < d_obj + segment_dist)
    n_obj = max(int(obj_px.sum()), 1)
    return float(occ.sum()) / n_obj


def frontal_grasp_base(object_pose, theta_deg, offset=0.10):
    """Grasp approach rotated from the side (theta=0, the default
    hand_base_for_grasp geometry: one finger between camera and object,
    ~10-18%% occlusion) toward the CAMERA side (theta=90: palm and both
    fingers between camera and object — the heavy-occlusion regime the
    reference paper's evaluation axis sweeps). z_h = palm->object."""
    T = np.asarray(object_pose, np.float32)
    c = T[:3, 3]
    th = np.radians(theta_deg)
    z_h = np.array([np.cos(th), 0.0, np.sin(th)], np.float32)
    y_h = np.array([0.0, 1.0, 0.0], np.float32)
    x_h = np.cross(y_h, z_h).astype(np.float32)
    R = np.stack([x_h, y_h, z_h], axis=1)
    out = np.eye(4, dtype=np.float32)
    out[:3, :3] = R
    out[:3, 3] = c - z_h * offset
    return out


def run_level(shape, dy, curl, frames, seeds, theta=0.0, self_occ=True,
              noise_sigma=0.001, dropout=0.02, finish_iters=-1):
    import jax
    import jax.numpy as jnp
    from icra20_hand_object_pose_tpu.datasets import (
        default_object_pose, hand_base_for_grasp, render_frame,
    )
    from icra20_hand_object_pose_tpu.evaluation import (
        add_s_error, add_error, symmetry_group,
    )
    from icra20_hand_object_pose_tpu.models import (
        Estimator, ObjectModel, Tracker, make_t42_hand,
    )
    from icra20_hand_object_pose_tpu.utils import meshio, se3
    from icra20_hand_object_pose_tpu.utils.config import (
        CameraIntrinsics, EstimatorConfig, PsoConfig, ScoreConfig,
    )

    cam = CameraIntrinsics(width=640, height=480, fx=570.0, fy=570.0,
                           cx=320.0, cy=240.0)
    pso_kw = {} if finish_iters < 0 else dict(finish_iters=finish_iters)
    cfg = EstimatorConfig(camera=cam, scene_points=2048,
                          pso=PsoConfig(particles=512, iters=10, **pso_kw),
                          score=ScoreConfig(self_occlusion=self_occ))
    mesh = meshio.make_test_object(shape)
    obj = ObjectModel(mesh, model_points=1024, render_points=2048)
    hand = make_t42_hand()
    est = Estimator(obj, hand, cfg)
    dense, _ = mesh.sample_surface(8192, seed=123)
    hq = np.asarray([curl, curl], np.float32)
    # Shapes with an exact discrete symmetry (square-prism box: D4, order
    # 8) are also scored with symmetry-group-aware ADD: a tracker sitting
    # on a true 90-deg twin is pose-correct (the depth image is IDENTICAL)
    # but sampled-cloud ADD-S floors at ~0.9 mm (8192 pts) because the
    # twin's samples land between the originals — measured r5 on the box:
    # clean level-0 ADD-S 1.18 mm with raw dT rot 32.6 deg / trans 32 mm
    # (some frames on a twin: dT is a rotation about the object CENTER,
    # so its matrix translation is |(I-R)c|, huge at 0.5 m range).
    try:
        syms = symmetry_group(shape)
    except ValueError:
        syms = [np.eye(4)]

    errs, occs, covs, n_reinit = [], [], [], 0
    sym_errs, rot_errs, trans_errs, axis_z = [], [], [], []
    for seed in range(seeds):
        rng = np.random.default_rng(7000 + seed)
        pose = default_object_pose()
        hb0 = (frontal_grasp_base(pose, theta) if theta > 0
               else hand_base_for_grasp(pose))
        # lateral shift of the grasp (hand y) slides the front finger
        # across the object face; theta rotates the whole approach
        # toward the camera (palm occlusion) for the heavy levels
        shift = np.eye(4, dtype=np.float32)
        shift[:3, 3] = hb0[:3, :3] @ np.asarray([0.0, dy, 0.0], np.float32)
        hb = (shift @ hb0).astype(np.float32)
        occs.append(measured_occlusion(mesh, pose, hand, hb, hq, cam))
        tracker = Tracker(est, seed=seed)
        tracker.state = tracker.state._replace(
            pose=jnp.asarray(pose), initialized=jnp.asarray(True),
            fitness=jnp.asarray(1.0),
        )
        key = jax.random.key(97 + seed)
        cur = pose
        for f in range(frames):
            key, k1 = jax.random.split(key)
            if f > 0:
                nxt = np.asarray(se3.perturb_pose(
                    k1, jnp.asarray(cur), 0.05, 0.004)).astype(np.float32)
                hb = (nxt @ np.linalg.inv(cur) @ hb).astype(np.float32)
                cur = nxt
            # EXACT raster observed data (r5): the splat renderer
            # (render_frame_fast) biases the observed surface toward the
            # camera by up to ~(radius+0.5) px * slope — a constant
            # ~0.5-1.2 mm ADD-S offset even for a perfect estimator
            # (measured r5 level-0 A/B: box 2.23 -> 1.72 mm, asym
            # 1.82 -> 1.03 mm). Accuracy protocols must consume the same
            # exact raster the headline protocol (generate_sequence)
            # uses; the splat stays only in pure-throughput benches.
            dep = render_frame(mesh, cur, hand, hb, hq, cam,
                               noise_sigma=noise_sigma, rng=rng)
            drop = rng.random(dep.shape) < dropout
            dep = np.where(drop, 0.0, dep).astype(np.float32)
            res = tracker.step(jnp.asarray(dep), jnp.asarray(hb),
                               jnp.asarray(hq))
            covs.append(float(res.coverage))
            n_reinit += bool(res.reinitialized)
            if f > 0:
                errs.append(add_s_error(np.asarray(res.pose), cur, dense))
                # symmetry-aware ADD (exact, floor-free) + pose-error
                # decomposition AFTER removing the best symmetry twin
                # (flat-face shapes concentrate error in the
                # silhouette-constrained DOF)
                per_sym = [add_error(np.asarray(res.pose), cur @ S, dense)
                           for S in syms]
                best = int(np.argmin(per_sym))
                sym_errs.append(per_sym[best])
                gt_b = cur @ syms[best]
                dT = np.asarray(res.pose) @ np.linalg.inv(gt_b)
                ang = np.clip((np.trace(dT[:3, :3]) - 1) / 2, -1, 1)
                rot_errs.append(np.degrees(np.arccos(ang)))
                # error-axis decomposition: |axis . z_cam| ~ 1 means the
                # rotation error is about the view axis (in-image spin —
                # point-to-plane ICP's null space on a camera-facing
                # face; silhouette-only evidence); ~0 means tilt (depth-
                # constrained, ICP should nail it)
                R = dT[:3, :3]
                w = np.array([R[2, 1] - R[1, 2], R[0, 2] - R[2, 0],
                              R[1, 0] - R[0, 1]])
                n = np.linalg.norm(w)
                axis_z.append(abs(w[2]) / n if n > 1e-9 else 0.0)
                # translation error AT THE OBJECT ORIGIN (dT[:3,3] alone
                # is the camera-origin displacement — at 0.5 m range a
                # pure rotation about the object reads ~theta*0.5 m there)
                trans_errs.append(np.linalg.norm(
                    np.asarray(res.pose)[:3, 3] - gt_b[:3, 3]))
    print(json.dumps({
        "shape": shape, "dy_mm": round(dy * 1000, 1), "curl": curl,
        "theta_deg": theta, "noise_sigma": noise_sigma,
        "occlusion_pct": round(100 * float(np.mean(occs)), 1),
        "adds_mm_tracked_mean": round(float(np.mean(errs)) * 1000, 3),
        "adds_mm_p90": round(float(np.quantile(errs, 0.9)) * 1000, 3),
        "add_sym_mm_tracked_mean": round(float(np.mean(sym_errs)) * 1000, 3),
        "add_sym_mm_p90": round(float(np.quantile(sym_errs, 0.9)) * 1000, 3),
        "rot_deg_mean": round(float(np.mean(rot_errs)), 3),
        "rot_axis_z_mean": round(float(np.mean(axis_z)), 3),
        "trans_mm_mean": round(float(np.mean(trans_errs)) * 1000, 3),
        # coverage under occlusion: validates the watchdog threshold
        # (TrackerConfig.coverage_reinit_threshold) stays collapse-only
        "coverage_min": round(float(np.min(covs)), 3),
        "coverage_mean": round(float(np.mean(covs)), 3),
        "reinit_frames": n_reinit,
        "n": len(errs),
    }), flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--shape", default="asym")
    ap.add_argument("--frames", type=int, default=8)
    ap.add_argument("--seeds", type=int, default=2)
    ap.add_argument("--no-self-occ", action="store_true",
                    help="A/B: disable ScoreConfig.self_occlusion")
    ap.add_argument("--theta", type=float, nargs="*", default=None,
                    help="run only these theta levels (default: all six)")
    ap.add_argument("--finish-iters", type=int, default=-1,
                    help="A/B: override PsoConfig.finish_iters (-1 = default)")
    ap.add_argument("--clean", action="store_true",
                    help="A/B: no sensor noise / dropout (bias-vs-variance "
                         "decomposition of a level's tracked error)")
    args = ap.parse_args()
    # sweep: the side grasp tops out ~18% measured occlusion (one finger
    # in front); rotating the approach toward the camera (theta) puts
    # palm + both fingers between camera and object for the heavy levels
    for dy, curl, theta in [(0.0, 0.45, 0.0), (0.0, 0.45, 30.0),
                            (0.0, 0.45, 50.0), (0.0, 0.45, 65.0),
                            (0.0, 0.45, 78.0), (0.0, 0.45, 88.0)]:
        if args.theta is not None and theta not in args.theta:
            continue
        run_level(args.shape, dy, curl, args.frames, args.seeds, theta,
                  self_occ=not args.no_self_occ,
                  noise_sigma=0.0 if args.clean else 0.001,
                  dropout=0.0 if args.clean else 0.02,
                  finish_iters=args.finish_iters)


if __name__ == "__main__":
    main()
