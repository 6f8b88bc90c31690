import time, numpy as np, jax, jax.numpy as jnp
from icra20_hand_object_pose_tpu.utils.jaxcache import enable_compilation_cache
enable_compilation_cache()
from icra20_hand_object_pose_tpu.datasets import (
    default_object_pose, hand_base_for_grasp, render_frame_fast)
from icra20_hand_object_pose_tpu.models import Estimator, ObjectModel, make_t42_hand
from icra20_hand_object_pose_tpu.models.estimator import Tracker, TrackerState
from icra20_hand_object_pose_tpu.utils import meshio, se3
from icra20_hand_object_pose_tpu.utils.config import (
    CameraIntrinsics, EstimatorConfig, PsoConfig)

cam = CameraIntrinsics(width=640, height=480, fx=570.0, fy=570.0, cx=320.0, cy=240.0)
cfg = EstimatorConfig(camera=cam, scene_points=2048,
                      pso=PsoConfig(particles=512, iters=10))
mesh = meshio.make_test_object("box")
hand = make_t42_hand()
obj = ObjectModel(mesh, model_points=1024, render_points=2048)
pose_gt = default_object_pose()
hb = hand_base_for_grasp(pose_gt)
hq = np.asarray([0.45, 0.45], np.float32)
depth = jnp.asarray(render_frame_fast(mesh, pose_gt, hand, hb, hq, cam, noise_sigma=0.001))
hbj, hqj = jnp.asarray(hb), jnp.asarray(hq)

tracker = Tracker(Estimator(obj, hand, cfg), seed=0)
def reset():
    tracker.state = TrackerState(
        pose=jnp.asarray(pose_gt), frame_idx=0, key=jax.random.key(0),
        initialized=jnp.asarray(True), fitness=jnp.asarray(1.0),
        coverage=jnp.asarray(1.0))

est = tracker.est
tr_cfg = cfg.tracker
alpha = tr_cfg.motion_prior

def old_step(depth_m, hand_base, hand_q):
    """The r3 Tracker.step: eager glue + 3 scalar fetches."""
    st = tracker.state
    key, sub = jax.random.split(st.key)
    need_init = (not bool(st.initialized)) or (
        float(st.fitness) < tr_cfg.fitness_reinit_threshold and bool(st.initialized)
    ) or (tr_cfg.coverage_reinit_threshold > 0.0 and bool(st.initialized)
          and st.coverage is not None
          and float(st.coverage) < tr_cfg.coverage_reinit_threshold)
    mode = "init" if need_init else "track"
    if alpha > 0.0 and not need_init:
        if st.prev_pose is not None:
            delta = se3.compose(st.pose, se3.inverse(st.prev_pose))
            if alpha != 1.0:
                delta = se3.se3_exp(alpha * se3.se3_log(delta))
            predicted = se3.compose(delta, st.pose)
        else:
            predicted = st.pose
        prev = jnp.stack([predicted, st.pose])
    else:
        prev = st.pose
    # emulate r3 frame_args costs: uncached sigma constants
    consts = (jnp.asarray(0.12, jnp.float32), jnp.asarray(0.01, jnp.float32),
              jnp.asarray(False), jnp.asarray(1.0, jnp.float32))
    out = est.estimate(depth_m, prev, hand_base, hand_q, key=sub, mode=mode)
    tracker.state = TrackerState(
        pose=out.pose, frame_idx=st.frame_idx+1, key=key,
        initialized=jnp.asarray(True), fitness=out.fitness,
        coverage=out.coverage,
        prev_pose=(st.pose if st.pose_tracked else None), pose_tracked=True)
    return out

# warm everything (both prev shapes for old path: [4,4] first frame, [2,4,4] after)
reset(); _ = old_step(depth, hbj, hqj); _ = old_step(depth, hbj, hqj)
_ = np.asarray(tracker.state.pose)
reset(); _ = tracker.step(depth, hbj, hqj); _ = tracker.step(depth, hbj, hqj)
_ = np.asarray(tracker.state.pose)

def timed(fn, n=12):
    t0 = time.perf_counter()
    for _ in range(n):
        fn(depth, hbj, hqj)
    _ = np.asarray(tracker.state.pose)
    return (time.perf_counter() - t0) / n * 1e3

olds, news = [], []
for rep in range(4):
    reset(); _ = old_step(depth, hbj, hqj); olds.append(timed(old_step))
    reset(); _ = tracker.step(depth, hbj, hqj); news.append(timed(tracker.step))
print("old ms/frame:", [round(x,1) for x in olds], "median", round(np.median(olds),1))
print("new ms/frame:", [round(x,1) for x in news], "median", round(np.median(news),1))
