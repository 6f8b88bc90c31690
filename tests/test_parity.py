"""Parity-harness tests (SURVEY.md §8 hard part 4): the comparator and
dump loaders are proven on synthetic "reference dumps" so that plugging
in real reference outputs, when /root/reference materializes, is a
one-file operation with an already-trusted harness."""
import json

import numpy as np
import pytest

from icra20_hand_object_pose_tpu import parity
from icra20_hand_object_pose_tpu.utils import meshio


def _traj(n=5, seed=0):
    rng = np.random.default_rng(seed)
    poses = []
    T = np.eye(4)
    T[:3, 3] = [0, 0, 0.5]
    for _ in range(n):
        w = rng.normal(0, 0.02, 3)
        th = np.linalg.norm(w)
        k = w / max(th, 1e-12)
        K = np.array([[0, -k[2], k[1]], [k[2], 0, -k[0]], [-k[1], k[0], 0]])
        R = np.eye(3) + np.sin(th) * K + (1 - np.cos(th)) * K @ K
        T = T.copy()
        T[:3, :3] = T[:3, :3] @ R
        T[:3, 3] += rng.normal(0, 0.003, 3)
        poses.append(T.copy())
    return poses


def test_identical_trajectories_report_identical():
    est = _traj()
    rep = parity.compare_pose_sequences(est, [p.copy() for p in est])
    assert rep.identical and rep.n_identical == len(est)
    assert rep.rot_deg_max < 1e-4 and rep.trans_max < 1e-9  # arccos precision


def test_deviation_detected_and_quantified():
    est = _traj()
    ref = [p.copy() for p in est]
    ref[2][:3, 3] += [0.002, 0, 0]       # 2 mm off on one frame
    mesh = meshio.make_test_object("box")
    pts, _ = mesh.sample_surface(512, seed=1)
    rep = parity.compare_pose_sequences(est, ref, pts)
    assert not rep.identical
    assert rep.n_identical == len(est) - 1
    assert rep.trans_max == pytest.approx(0.002, rel=1e-6)
    assert rep.add_s_max == pytest.approx(0.002, rel=0.2)  # pure translation
    assert "identical" in str(rep)


def test_length_mismatch_raises():
    with pytest.raises(ValueError, match="estimated vs"):
        parity.compare_pose_sequences(_traj(4), _traj(5))


def test_load_pose_dump_formats(tmp_path):
    poses = _traj(3)
    # directory of 4x4 .txt (the reference driver's layout, SURVEY §4.2)
    d = tmp_path / "dumpdir"
    d.mkdir()
    for i, p in enumerate(poses):
        np.savetxt(d / f"{i:06d}.txt", p)
    # jsonl with "pose" records (this repo's metrics.jsonl)
    jl = tmp_path / "poses.jsonl"
    with open(jl, "w") as f:
        for p in poses:
            f.write(json.dumps({"pose": p.tolist(), "other": 1}) + "\n")
    # stacked single .txt, .npy, .npz
    st = tmp_path / "stacked.txt"
    np.savetxt(st, np.concatenate(poses))
    npy = tmp_path / "poses.npy"
    np.save(npy, np.stack(poses))
    npz = tmp_path / "poses.npz"
    np.savez(npz, poses=np.stack(poses))
    for path in [str(d), str(jl), str(st), str(npy), str(npz)]:
        loaded = parity.load_pose_dump(path)
        assert len(loaded) == 3
        for a, b in zip(loaded, poses):
            np.testing.assert_allclose(a, b, atol=1e-9)


def test_reference_parity_end_to_end(tmp_path):
    """The one-call entry point a populated /root/reference will use."""
    poses = _traj(4)
    d1 = tmp_path / "est"; d1.mkdir()
    d2 = tmp_path / "ref"; d2.mkdir()
    for i, p in enumerate(poses):
        np.savetxt(d1 / f"{i:06d}.txt", p)
        np.savetxt(d2 / f"{i:06d}.txt", p)
    rep = parity.reference_parity(str(d1), str(d2))
    assert rep.identical
