"""Benchmarks (packaged; the repo-root `bench.py` shim is the driver entry).

Headline: ICP-refined pose hypotheses/sec/chip @ 512 particles.
BASELINE.json metric: every PSO iteration renders, scores, and
ICP-refines the full 512-particle swarm, so one frame step performs
(particles * pso_iters) ICP-refined hypothesis evaluations. The
reference's serial C++ loop is the per-hypothesis unit of work this
rate is measured against (target: >= 1000/sec/chip on v5e).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "hypotheses/sec/chip", "vs_baseline": N}
"""
from __future__ import annotations

import json
import time

import numpy as np


def bench_sweep(n_objects: int = 8) -> None:
    """BASELINE config 5: whole model library tracked concurrently as one
    jit program (object axis; single chip here, sharded on a slice).
    Prints one JSON line; run via `python bench.py --sweep`."""
    import jax
    import jax.numpy as jnp
    from icra20_hand_object_pose_tpu.datasets import (
        default_object_pose, hand_base_for_grasp, render_frame_fast,
    )
    from icra20_hand_object_pose_tpu.models import ObjectModel, make_t42_hand
    from icra20_hand_object_pose_tpu.parallel import LibrarySweep
    from icra20_hand_object_pose_tpu.utils import meshio
    from icra20_hand_object_pose_tpu.utils.config import (
        CameraIntrinsics, EstimatorConfig, PsoConfig,
    )

    cam = CameraIntrinsics(width=640, height=480, fx=570.0, fy=570.0,
                           cx=320.0, cy=240.0)
    pso_iters = 10
    particles = 128  # per object; n_objects tracked concurrently
    cfg = EstimatorConfig(
        camera=cam, scene_points=2048,
        pso=PsoConfig(particles=particles, iters=pso_iters),
    )
    shapes = ["box", "cylinder", "sphere", "ellipsoid"]
    meshes = [meshio.make_test_object(shapes[i % 4]) for i in range(n_objects)]
    hand = make_t42_hand()
    objs = [ObjectModel(m, seed=i) for i, m in enumerate(meshes)]
    sweep = LibrarySweep(objs, hand, cfg)
    pose_gt = default_object_pose()
    hb = hand_base_for_grasp(pose_gt)
    hq = np.asarray([0.45, 0.45], np.float32)
    depths = jnp.stack([
        jnp.asarray(render_frame_fast(m, pose_gt, hand, hb, hq, cam,
                                      noise_sigma=0.001))
        for m in meshes
    ])
    hbs = jnp.tile(jnp.asarray(hb)[None], (n_objects, 1, 1))
    hqs = jnp.tile(jnp.asarray(hq)[None], (n_objects, 1))

    st = sweep.init_state()
    st, res = sweep.step(st, depths, hbs, hqs)     # compile (init mode decided
    _ = np.asarray(res.poses)                      # per object on device)
    n_rep = 5
    t0 = time.perf_counter()
    for _ in range(n_rep):
        st, res = sweep.step(st, depths, hbs, hqs)
    _ = np.asarray(res.poses)
    dt = (time.perf_counter() - t0) / n_rep
    value = n_objects / dt
    print(json.dumps({
        "metric": f"library_sweep_objects_tracked_per_sec_{n_objects}obj_128p",
        "value": round(value, 2),
        "unit": "object-frames/sec/chip",
        "vs_baseline": round(value * particles * pso_iters / 1000.0, 3),
    }))


def main() -> None:
    import jax
    import jax.numpy as jnp
    from icra20_hand_object_pose_tpu.datasets import (
        default_object_pose, hand_base_for_grasp, render_frame_fast,
    )
    from icra20_hand_object_pose_tpu.models import (
        Estimator, ObjectModel, make_t42_hand,
    )
    from icra20_hand_object_pose_tpu.utils import meshio
    from icra20_hand_object_pose_tpu.utils.config import (
        CameraIntrinsics, EstimatorConfig, PsoConfig,
    )

    # Benchmark config = BASELINE config 3: 512-particle PSO with
    # render-and-compare + finger-occlusion masks on a grasp frame.
    cam = CameraIntrinsics(width=640, height=480, fx=570.0, fy=570.0,
                           cx=320.0, cy=240.0)
    pso_iters = 10
    cfg = EstimatorConfig(
        camera=cam, scene_points=2048,
        pso=PsoConfig(particles=512, iters=pso_iters),
    )
    mesh = meshio.make_test_object("box")
    hand = make_t42_hand()
    obj = ObjectModel(mesh, model_points=1024, render_points=2048)
    pose_gt = default_object_pose()
    hand_base = hand_base_for_grasp(pose_gt)
    hand_q = np.asarray([0.45, 0.45], np.float32)
    depth_np = render_frame_fast(
        mesh, pose_gt, hand, hand_base, hand_q, cam, noise_sigma=0.001
    )

    est = Estimator(obj, hand, cfg)
    depth = jnp.asarray(depth_np)
    prev = jnp.asarray(pose_gt)
    hb = jnp.asarray(hand_base)
    hq = jnp.asarray(hand_q)

    def run(seed):
        return est.estimate(depth, prev, hb, hq, key=jax.random.key(seed),
                            mode="track")

    out = run(0)  # compile
    _ = np.asarray(out.pose)  # host fetch: tunnels ignore block_until_ready
    n_rep = 8
    t0 = time.perf_counter()
    for i in range(n_rep):
        out = run(i + 1)
    _ = np.asarray(out.pose)
    dt = (time.perf_counter() - t0) / n_rep

    hyps_per_frame = cfg.pso.particles * pso_iters
    value = hyps_per_frame / dt
    baseline_target = 1000.0  # BASELINE.json: >=1000 hyp/sec/chip target
    print(json.dumps({
        "metric": "icp_refined_pose_hypotheses_per_sec_per_chip_512p",
        "value": round(value, 1),
        "unit": "hypotheses/sec/chip",
        "vs_baseline": round(value / baseline_target, 3),
    }))


def cli(argv=None) -> None:
    import sys

    argv = sys.argv[1:] if argv is None else argv
    if "--sweep" in argv:
        bench_sweep()
    else:
        main()


if __name__ == "__main__":
    cli()
