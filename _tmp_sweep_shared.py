"""A/B: per-scene vs shared-scene sweep step on TPU (8 obj x 128p VGA)."""
import time, numpy as np, jax, jax.numpy as jnp
from icra20_hand_object_pose_tpu.utils.jaxcache import enable_compilation_cache
enable_compilation_cache()
from icra20_hand_object_pose_tpu.datasets import (
    default_object_pose, hand_base_for_grasp, render_frame_fast)
from icra20_hand_object_pose_tpu.models import ObjectModel, make_t42_hand
from icra20_hand_object_pose_tpu.parallel import LibrarySweep
from icra20_hand_object_pose_tpu.utils import meshio
from icra20_hand_object_pose_tpu.utils.config import (
    CameraIntrinsics, EstimatorConfig, PsoConfig)

cam = CameraIntrinsics(width=640, height=480, fx=570.0, fy=570.0, cx=320.0, cy=240.0)
shapes = ["box", "cylinder", "sphere", "ellipsoid"]
meshes = [meshio.make_test_object(shapes[i % 4]) for i in range(8)]
hand = make_t42_hand()
objs = [ObjectModel(m, seed=i) for i, m in enumerate(meshes)]
pose_gt = default_object_pose()
hb = hand_base_for_grasp(pose_gt)
hq = np.asarray([0.45, 0.45], np.float32)
depth1 = jnp.asarray(render_frame_fast(meshes[0], pose_gt, hand, hb, hq, cam,
                                       noise_sigma=0.001))
depths = jnp.stack([jnp.asarray(render_frame_fast(m, pose_gt, hand, hb, hq,
                    cam, noise_sigma=0.001)) for m in meshes])
hbs = jnp.tile(jnp.asarray(hb)[None], (8, 1, 1))
hqs = jnp.tile(jnp.asarray(hq)[None], (8, 1))
hb1, hq1 = jnp.asarray(hb), jnp.asarray(hq)

for particles in (128, 512):
    cfg = EstimatorConfig(camera=cam, scene_points=2048,
                          pso=PsoConfig(particles=particles, iters=10))
    per = LibrarySweep(objs, hand, cfg)
    sh = LibrarySweep(objs, hand, cfg, shared_scene=True)
    # warm both variants of both sweeps (init on frame 1, track on 2),
    # then >=13 steps to exit the tunnel dispatch-warmup regime
    stp = per.init_state(); sts = sh.init_state()
    for _ in range(2):
        stp, rp = per.step(stp, depths, hbs, hqs)
        sts, rs = sh.step(sts, depth1, hb1, hq1)
    _ = np.asarray(rp.poses); _ = np.asarray(rs.poses)
    for _ in range(13):
        stp, rp = per.step(stp, depths, hbs, hqs)
    _ = np.asarray(rp.poses)
    for _ in range(13):
        sts, rs = sh.step(sts, depth1, hb1, hq1)
    _ = np.asarray(rs.poses)
    for rep in range(3):
        t0 = time.perf_counter()
        for _ in range(5):
            stp, rp = per.step(stp, depths, hbs, hqs)
        _ = np.asarray(rp.poses)
        t_per = (time.perf_counter() - t0) / 5 * 1e3
        t0 = time.perf_counter()
        for _ in range(5):
            sts, rs = sh.step(sts, depth1, hb1, hq1)
        _ = np.asarray(rs.poses)
        t_sh = (time.perf_counter() - t0) / 5 * 1e3
        print(f"{particles}p rep{rep}: per-scene {t_per:.1f} ms  "
              f"shared {t_sh:.1f} ms  ({t_per/t_sh:.2f}x)")
    # sanity: shared tracks the true object (index 0 and 4 are box... 0 only)
    import icra20_hand_object_pose_tpu.utils.se3 as se3
    err0 = float(se3.add_s_error(rs.poses[0], jnp.asarray(pose_gt),
                                 objs[0].model_pts))
    print(f"{particles}p shared box ADD-S: {err0*1000:.2f} mm; "
          f"fitness argmax obj {int(np.argmax(np.asarray(rs.fitness)))}")
