"""Evaluation metrics + JSONL logging (SURVEY.md §5/§6)."""
import json

import numpy as np

from icra20_hand_object_pose_tpu import evaluation as ev
from icra20_hand_object_pose_tpu.utils import meshio


def _pose(t=(0, 0, 0.5), rot_z_deg=0.0):
    T = np.eye(4, dtype=np.float64)
    a = np.radians(rot_z_deg)
    T[:2, :2] = [[np.cos(a), -np.sin(a)], [np.sin(a), np.cos(a)]]
    T[:3, 3] = t
    return T


def test_add_identity_zero():
    pts = np.random.default_rng(0).normal(size=(200, 3)) * 0.05
    T = _pose()
    assert ev.add_error(T, T, pts) == 0.0
    assert ev.add_s_error(T, T, pts) == 0.0


def test_add_translation_exact():
    pts = np.random.default_rng(0).normal(size=(200, 3)) * 0.05
    a, b = _pose(), _pose(t=(0.003, 0, 0.5))
    assert abs(ev.add_error(a, b, pts) - 0.003) < 1e-9
    assert abs(ev.translation_error(a, b) - 0.003) < 1e-12


def test_add_s_symmetry_invariant():
    """A symmetry flip of a box must read ~0 ADD-S with a dense cloud but
    large ADD."""
    mesh = meshio.make_test_object("box")
    pts, _ = mesh.sample_surface(8192, seed=0)
    T = _pose()
    Tf = T @ np.diag([-1.0, -1.0, 1.0, 1.0])
    assert ev.add_error(Tf, T, pts) > 0.02
    assert ev.add_s_error(Tf, T, pts) < 0.0015


def test_rotation_error():
    assert abs(ev.rotation_error_deg(_pose(), _pose(rot_z_deg=10)) - 10.0) < 1e-5


def test_auc_extremes():
    assert ev.auc([0.0, 0.0]) > 0.99
    assert ev.auc([10.0, 10.0]) == 0.0


def test_evaluate_trajectory_and_summary():
    mesh = meshio.make_test_object("box")
    pts, _ = mesh.sample_surface(256, seed=0)
    gt = [_pose(), _pose(t=(0.001, 0, 0.5))]
    est = [_pose(t=(0.001, 0, 0.5)), _pose(t=(0.001, 0, 0.5))]
    s = ev.evaluate_trajectory(est, gt, pts, diameter=0.1, mesh=mesh,
                               eval_points=1024)
    assert s.n_frames == 2
    assert s.add_s_mean < 0.002
    assert 0 <= s.success_rate_10pct_diam <= 1
    str(s)  # formats


def test_jsonl_logger(tmp_path):
    p = str(tmp_path / "m.jsonl")
    with ev.JsonlLogger(p) as log:
        log.log(frame=0, pose=np.eye(4), fitness=np.float32(1.5))
        log.log(frame=1, ok=True)
    lines = [json.loads(l) for l in open(p)]
    assert lines[0]["frame"] == 0
    assert lines[0]["pose"][0][0] == 1.0
    assert abs(lines[0]["fitness"] - 1.5) < 1e-6
    assert lines[1]["ok"] is True


def test_phase_timer_and_hlo_cost():
    import jax.numpy as jnp

    from icra20_hand_object_pose_tpu.utils import profiling

    t = profiling.PhaseTimer()
    x = jnp.arange(8.0)
    with t.phase("square", sync_on=None):
        y = x * x
        t.sync(y)
    with t.phase("square"):
        _ = x + 1
    rep = t.report()
    assert "square" in rep and t.counts["square"] == 2

    cost = profiling.hlo_cost(lambda a: (a @ a.T).sum(), jnp.ones((64, 64)))
    assert isinstance(cost, dict)


def test_add_sym_exact_under_symmetry_flip():
    """ADD-S floors at ~half the sample spacing under a symmetry flip;
    symmetry-aware ADD is exact (the r2 metric-floor diagnosis)."""
    import pytest

    from icra20_hand_object_pose_tpu.evaluation import (
        add_s_error, add_sym_error, symmetry_group,
    )
    from icra20_hand_object_pose_tpu.utils import meshio

    mesh = meshio.make_test_object("ellipsoid")
    pts, _ = mesh.sample_surface(2048, seed=1)
    T_gt = np.eye(4); T_gt[:3, 3] = [0, 0, 0.5]
    # estimate = exact 180-deg flip about x (a true symmetry)
    S = np.eye(4); S[1, 1] = S[2, 2] = -1.0
    T_est = T_gt @ S
    adds = add_s_error(T_est, T_gt, pts)
    sym = add_sym_error(T_est, T_gt, pts, symmetry_group("ellipsoid"))
    assert adds > 5e-4          # the sampling floor is visible
    assert sym < 1e-6           # symmetry-aware metric removes it
    # and a genuinely wrong pose is still measured
    T_bad = T_gt.copy(); T_bad[:3, 3] += [0.004, 0, 0]
    assert add_sym_error(T_bad, T_gt, pts, symmetry_group("ellipsoid")) == (
        pytest.approx(0.004, rel=1e-5)
    )


def test_box_symmetry_group_is_true_symmetry_set():
    """Every catalogued box symmetry must map the square-prism vertex set
    to itself (ADVICE r2: the test box has a square cross-section, so C4
    z-rotations are true symmetries D2 alone missed), and the group must
    remove the metric artifact for a correct 90-degree z-flip."""
    from scipy.spatial import cKDTree

    from icra20_hand_object_pose_tpu.evaluation import (
        add_sym_error, symmetry_group,
    )
    from icra20_hand_object_pose_tpu.utils import meshio

    mesh = meshio.make_test_object("box")
    group = symmetry_group("box")
    assert len(group) == 8  # square-prism proper rotation group
    for S in group:
        v = mesh.vertices @ S[:3, :3].T + S[:3, 3]
        d, _ = cKDTree(mesh.vertices).query(v, k=1)
        assert d.max() < 1e-6, "catalogued transform is not a symmetry"
    # a correct 90-degree z-rotation estimate must read ~0 error
    Rz90 = group[1]
    T_gt = np.eye(4); T_gt[:3, 3] = [0, 0, 0.5]
    pts, _ = mesh.sample_surface(2048, seed=2)
    assert add_sym_error(T_gt @ Rz90, T_gt, pts, group) < 1e-6
