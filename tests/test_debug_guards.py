"""NaN-guard CI (SURVEY.md §6 "Race detection / sanitizers"; VERDICT r1
item 8): the entire frame program — hand FK, preprocessing, PSO, ICP,
scoring (including the subpixel bilinear gather and its masked-out
branches) — must execute under jax_debug_nans without a single primitive
producing a NaN, even a masked one. This keeps sentinel arithmetic
honest: padding/invalid encodings must use finite sentinels, and every
division/sqrt must be clamped, or this test fails loudly."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from icra20_hand_object_pose_tpu.datasets import synthetic
from icra20_hand_object_pose_tpu.models import (
    Estimator, ObjectModel, Tracker, make_t42_hand,
)
from icra20_hand_object_pose_tpu.utils import meshio
from icra20_hand_object_pose_tpu.utils.config import (
    CameraIntrinsics, EstimatorConfig, HandConfig, PsoConfig, TrackerConfig,
)

CAM = CameraIntrinsics(fx=140.0, fy=140.0, cx=64.0, cy=48.0, width=128, height=96)


@pytest.fixture()
def debug_nans():
    jax.config.update("jax_debug_nans", True)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", False)


def test_frame_step_nan_free_under_debug_nans(debug_nans):
    cfg = EstimatorConfig(
        camera=CAM,
        pso=PsoConfig(particles=16, iters=3, icp_iters_inner=2),
        hand=HandConfig(config_samples=2),
        tracker=TrackerConfig(reinit_particles=32),
        scene_points=256, model_points=128, render_size=48, depth_min=0.05,
    )
    mesh = meshio.make_test_object("box")
    obj = ObjectModel(mesh, model_points=128, render_points=256)
    hand = make_t42_hand(points_per_link=64)
    frames = synthetic.generate_sequence(
        mesh, hand,
        synthetic.SyntheticSequenceConfig(
            n_frames=1, camera=CAM, noise_sigma=0.001, dropout=0.05, seed=1,
        ),
    )
    f = frames[0]
    est = Estimator(obj, hand, cfg)
    # both compiled variants: global init AND tracking
    tracker = Tracker(est, seed=0)
    out = tracker.step(
        jnp.asarray(f.depth), jnp.asarray(f.hand_base), jnp.asarray(f.hand_q)
    )
    assert np.isfinite(np.asarray(out.pose)).all()
    out = tracker.step(
        jnp.asarray(f.depth), jnp.asarray(f.hand_base), jnp.asarray(f.hand_q)
    )
    assert np.isfinite(float(out.fitness))


def test_empty_frame_nan_free_under_debug_nans(debug_nans):
    """All-invalid depth (the watchdog-trigger case) exercises every
    degenerate path: zero valid points, empty centroid, all-padding ICP."""
    cfg = EstimatorConfig(
        camera=CAM,
        pso=PsoConfig(particles=16, iters=3, icp_iters_inner=2),
        hand=HandConfig(enabled=False),
        tracker=TrackerConfig(reinit_particles=32),
        scene_points=256, model_points=128, render_size=48,
    )
    obj = ObjectModel(meshio.make_test_object("box"), model_points=128,
                      render_points=256)
    est = Estimator(obj, None, cfg)
    prev = jnp.asarray(synthetic.default_object_pose())
    out = est.estimate(jnp.zeros((CAM.height, CAM.width)), prev,
                       key=jax.random.key(0))
    assert np.isfinite(np.asarray(out.pose)).all()
