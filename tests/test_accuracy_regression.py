"""Pinned accuracy regression gate (VERDICT r2 item 2).

The README accuracy table comes from scripts/eval_accuracy.py runs; the
rest of the suite only asserts loose (<10 mm) bounds, so a silent
regression from ~1 mm to ~8 mm would pass green. This test pins a
REDUCED but fixed configuration — 320x240, 256 particles, 4 frames,
first pose given (standard tracking protocol) — with thresholds set at
measured + ~30% slack (measured on the CPU mesh, 2026-08-17:
asym clean 1.04 mm / asym noisy 1.80 mm / mug noisy 2.65 mm mean
dense-cloud ADD-S).

Budget: ~3 min on the CPU mesh (one compile per shape, reused across
noise conditions). Runs in the estimator test group.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from icra20_hand_object_pose_tpu.datasets import (
    SyntheticSequenceConfig, generate_sequence,
)
from icra20_hand_object_pose_tpu.evaluation import add_s_error
from icra20_hand_object_pose_tpu.models import (
    Estimator, ObjectModel, Tracker, make_t42_hand,
)
from icra20_hand_object_pose_tpu.utils import meshio
from icra20_hand_object_pose_tpu.utils.config import (
    CameraIntrinsics, EstimatorConfig, PsoConfig,
)

CAM = CameraIntrinsics(width=320, height=240, fx=285.0, fy=285.0,
                       cx=160.0, cy=120.0)
N_FRAMES = 4

# mean dense-cloud ADD-S thresholds (meters): measured + ~30% slack
THRESHOLDS = {
    ("asym", False): 1.4e-3,
    ("asym", True): 2.4e-3,
    ("mug", True): 3.5e-3,
}
WORST_FRAME = 8e-3   # any single frame above this = tracking loss


@pytest.fixture(scope="module")
def estimators():
    cfg = EstimatorConfig(camera=CAM, scene_points=1024,
                          pso=PsoConfig(particles=256, iters=10))
    hand = make_t42_hand()
    cache = {}

    def get(shape):
        if shape not in cache:
            mesh = meshio.make_test_object(shape)
            cache[shape] = (mesh, Estimator(ObjectModel(mesh), hand, cfg))
        return cache[shape]

    return get, hand


@pytest.mark.parametrize("shape,noise", list(THRESHOLDS))
def test_tracked_adds_pinned(estimators, shape, noise):
    get, hand = estimators
    mesh, est = get(shape)
    seq = generate_sequence(mesh, hand, SyntheticSequenceConfig(
        n_frames=N_FRAMES, camera=CAM,
        noise_sigma=0.001 if noise else 0.0,
        dropout=0.02 if noise else 0.0, seed=3,
    ))
    tracker = Tracker(est, seed=0)
    tracker.state = tracker.state._replace(
        pose=jnp.asarray(seq[0].pose_gt),
        initialized=jnp.asarray(True), fitness=jnp.asarray(1.0),
    )
    dense, _ = mesh.sample_surface(8192, seed=123)
    errs = []
    for fr in seq:
        out = tracker.step(jnp.asarray(fr.depth), jnp.asarray(fr.hand_base),
                           jnp.asarray(fr.hand_q))
        errs.append(add_s_error(np.asarray(out.pose), fr.pose_gt, dense))
    mean = float(np.mean(errs))
    assert mean < THRESHOLDS[(shape, noise)], (
        f"{shape} noise={noise}: mean ADD-S {mean*1000:.2f} mm exceeds the "
        f"pinned {THRESHOLDS[(shape, noise)]*1000:.1f} mm gate "
        f"(per-frame mm: {[round(e*1000, 2) for e in errs]})"
    )
    assert max(errs) < WORST_FRAME, [round(e * 1000, 2) for e in errs]
