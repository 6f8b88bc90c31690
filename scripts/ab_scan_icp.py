#!/usr/bin/env python
"""A/B: in-scan ICP search cadence and subset sizes vs frame time + ADD.

The phase profile names the PSO scan (~26 ms of a ~46 ms frame) as the
largest phase, and the in-scan correspondence searches dominate it
(icp_every=1 x icp_iters_inner=2 -> 20 searches/frame at [512,512,512]).
Candidates that cut search work, each measured for BOTH wall time and
tracked accuracy on the noisy asym sequence (the pinned-gate condition):

  base   : icp_iters_inner=2, gn_reps=2, subsets 512/512  (production)
  i1r3   : 1 search/iter, 3 GN reps            (half the searches)
  i1r4   : 1 search/iter, 4 GN reps
  m256   : subsets 512 scene / 256 model       (half the acc tile)
  i1r3m256: both

Usage: python scripts/ab_scan_icp.py [--frames 8] [--seeds 2]
"""
from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from icra20_hand_object_pose_tpu.utils.jaxcache import enable_compilation_cache  # noqa: E402
enable_compilation_cache()


def run_variant(name, pso_kw, icp_kw, frames, seeds, shape="asym"):
    import jax
    import jax.numpy as jnp
    from icra20_hand_object_pose_tpu.datasets import (
        default_object_pose, hand_base_for_grasp, render_frame_fast,
    )
    from icra20_hand_object_pose_tpu.evaluation import add_error
    from icra20_hand_object_pose_tpu.models import (
        Estimator, ObjectModel, Tracker, make_t42_hand,
    )
    from icra20_hand_object_pose_tpu.utils import meshio
    from icra20_hand_object_pose_tpu.utils.config import (
        CameraIntrinsics, EstimatorConfig, IcpConfig, PsoConfig,
    )

    cam = CameraIntrinsics(width=640, height=480, fx=570.0, fy=570.0,
                           cx=320.0, cy=240.0)
    cfg = EstimatorConfig(
        camera=cam, scene_points=2048,
        pso=dataclasses.replace(PsoConfig(particles=512, iters=10), **pso_kw),
        icp=dataclasses.replace(IcpConfig(), **icp_kw),
    )
    mesh = meshio.make_test_object(shape)
    obj = ObjectModel(mesh, model_points=1024, render_points=2048)
    hand = make_t42_hand()
    est = Estimator(obj, hand, cfg)
    dense, _ = mesh.sample_surface(8192, seed=123)
    hq = np.asarray([0.45, 0.45], np.float32)

    # latency: AOT-compiled track program, queue-then-fetch timing
    pose_gt = default_object_pose()
    hb = hand_base_for_grasp(pose_gt)
    depth = jnp.asarray(render_frame_fast(
        mesh, pose_gt, hand, hb, hq, cam, noise_sigma=0.001))
    dyn, static = est.frame_args(depth, jnp.asarray(pose_gt), jnp.asarray(hb),
                                 jnp.asarray(hq), key=jax.random.key(0))
    compiled = est._step_jit.lower(*dyn, **static).compile()
    out = compiled(*dyn)
    np.asarray(out.pose)
    t0 = time.perf_counter()
    n_rep = 8
    for i in range(n_rep):
        d, _ = est.frame_args(depth, jnp.asarray(pose_gt), jnp.asarray(hb),
                              jnp.asarray(hq), key=jax.random.key(i + 1))
        out = compiled(*d)
    np.asarray(out.pose)
    ms = (time.perf_counter() - t0) / n_rep * 1000.0

    # accuracy: noisy tracked sequence, GT-init protocol (the pinned-gate
    # condition minus the reduced resolution)
    from icra20_hand_object_pose_tpu.datasets import (
        SyntheticSequenceConfig, generate_sequence,
    )

    errs = []
    for seed in range(seeds):
        seq_cfg = SyntheticSequenceConfig(
            n_frames=frames, camera=cam, noise_sigma=0.001, dropout=0.02,
            seed=3 + seed,
        )
        frs = generate_sequence(mesh, hand, seq_cfg)
        tracker = Tracker(est, seed=seed)
        tracker.state = tracker.state._replace(
            pose=jnp.asarray(frs[0].pose_gt),
            initialized=jnp.asarray(True),
            fitness=jnp.asarray(1.0),
        )
        for fr in frs:
            res = tracker.step(jnp.asarray(fr.depth),
                               jnp.asarray(fr.hand_base),
                               jnp.asarray(fr.hand_q))
            errs.append(add_error(np.asarray(res.pose), fr.pose_gt, dense))
    e = np.asarray(errs) * 1000.0
    print(json.dumps({"variant": name, "shape": shape,
                      "ms_per_frame": round(ms, 2),
                      "tracked_add_mm": round(float(e.mean()), 3),
                      "add_mm_median": round(float(np.median(e)), 3),
                      "add_mm_p90": round(float(np.quantile(e, 0.9)), 3),
                      "n_over_5mm": int((e > 5.0).sum()),
                      "n_err": len(errs)}), flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=8)
    ap.add_argument("--seeds", type=int, default=2)
    ap.add_argument("--only", type=str, default=None)
    ap.add_argument("--shape", type=str, default="asym")
    args = ap.parse_args()
    variants = {
        "base": ({}, {}),
        "i1r3": ({"icp_iters_inner": 1}, {"gn_reps": 3}),
        "i1r4": ({"icp_iters_inner": 1}, {"gn_reps": 4}),
        "m256": ({"icp_model_subset": 256}, {}),
        "i1r3m256": ({"icp_iters_inner": 1, "icp_model_subset": 256},
                     {"gn_reps": 3}),
        "i1r3m256f4": ({"icp_iters_inner": 1, "icp_model_subset": 256,
                        "finish_iters": 4},
                       {"gn_reps": 3}),
        "i1r3m256s768": ({"icp_iters_inner": 1, "icp_model_subset": 256,
                          "icp_scene_subset": 768},
                         {"gn_reps": 3}),
    }
    for name, (pso_kw, icp_kw) in variants.items():
        if args.only and name not in args.only.split(","):
            continue
        run_variant(name, pso_kw, icp_kw, args.frames, args.seeds,
                    shape=args.shape)


if __name__ == "__main__":
    main()
