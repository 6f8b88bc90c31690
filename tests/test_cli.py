"""CLI driver end-to-end on tiny configs (SURVEY.md §2 L5)."""
import json
import os

import numpy as np
import pytest
import yaml

from icra20_hand_object_pose_tpu import cli
from icra20_hand_object_pose_tpu.utils import meshio


@pytest.fixture(scope="module")
def tiny_cfg_yaml(tmp_path_factory):
    d = tmp_path_factory.mktemp("cfg")
    cfg = {
        "scene_points": 256,
        "render_size": 48,
        "pso": {"particles": 16, "iters": 2, "icp_iters_inner": 2,
                "finish_iters": 2, "finish_particles": 16},
        "tracker": {"reinit_particles": 16},
        "hand": {"config_samples": 2},
    }
    p = str(d / "cfg.yaml")
    with open(p, "w") as f:
        yaml.safe_dump(cfg, f)
    return p


def test_demo_track_eval_roundtrip(tmp_path, tiny_cfg_yaml):
    out = str(tmp_path / "out")
    rc = cli.main([
        "demo", "--frames", "2", "--width", "64", "--height", "48",
        "--config", tiny_cfg_yaml, "--out", out, "--overlays",
    ])
    assert rc is None or rc == 0
    assert os.path.exists(os.path.join(out, "metrics.jsonl"))
    assert os.path.exists(os.path.join(out, "summary.json"))
    assert os.path.exists(os.path.join(out, "poses", "000001.txt"))
    assert os.path.exists(os.path.join(out, "overlays", "overlay_000001.png"))
    recs = [json.loads(l) for l in open(os.path.join(out, "metrics.jsonl"))]
    assert len(recs) == 2 and "add_s" in recs[0]

    # eval on the produced artifacts
    mesh_path = str(tmp_path / "box.obj")
    meshio.save_obj(meshio.make_test_object("box"), mesh_path)
    rc = cli.main([
        "eval", "--poses", os.path.join(out, "metrics.jsonl"),
        "--data", os.path.join(out, "sequence"), "--object", mesh_path,
    ])
    assert rc is None or rc == 0

    # track the saved sequence directly
    out2 = str(tmp_path / "out2")
    rc = cli.main([
        "track", "--data", os.path.join(out, "sequence"),
        "--object", mesh_path, "--config", tiny_cfg_yaml, "--out", out2,
    ])
    assert rc is None or rc == 0
    assert os.path.exists(os.path.join(out2, "summary.json"))


def test_eval_missing_poses_is_clean_error(tmp_path, capsys):
    mesh_path = str(tmp_path / "box.obj")
    meshio.save_obj(meshio.make_test_object("box"), mesh_path)
    seq = str(tmp_path / "noseq")
    rc = cli.main([
        "eval", "--poses", "/nonexistent.jsonl", "--data", seq,
        "--object", mesh_path,
    ])
    assert rc == 2
    assert "not found" in capsys.readouterr().err


def test_sweep_two_objects(tmp_path, tiny_cfg_yaml):
    """cli sweep: two (object, sequence) pairs tracked concurrently as one
    device program; per-object pose files + JSONL metrics."""
    from icra20_hand_object_pose_tpu.datasets import (
        SyntheticSequenceConfig, generate_sequence,
    )
    from icra20_hand_object_pose_tpu.datasets.sequence import save_sequence
    from icra20_hand_object_pose_tpu.models import make_t42_hand
    from icra20_hand_object_pose_tpu.utils.config import CameraIntrinsics

    cam = CameraIntrinsics(width=64, height=48, fx=58.0, fy=58.0,
                           cx=32.0, cy=24.0)
    hand = make_t42_hand(points_per_link=64)
    datas, objects = [], []
    for i, kind in enumerate(["box", "cylinder"]):
        mesh = meshio.make_test_object(kind)
        frames = generate_sequence(
            mesh, hand, SyntheticSequenceConfig(n_frames=2, camera=cam, seed=i)
        )
        seq_dir = str(tmp_path / f"seq{i}")
        save_sequence(frames, cam, seq_dir)
        mesh_path = str(tmp_path / f"obj{i}.obj")
        meshio.save_obj(mesh, mesh_path)
        datas.append(seq_dir)
        objects.append(mesh_path)
    out = str(tmp_path / "sweep_out")
    rc = cli.main([
        "sweep", "--data", datas[0], "--data", datas[1],
        "--object", objects[0], "--object", objects[1],
        "--config", tiny_cfg_yaml, "--out", out,
    ])
    assert rc is None or rc == 0
    recs = [json.loads(l) for l in open(os.path.join(out, "metrics.jsonl"))]
    assert len(recs) == 2
    assert len(recs[0]["fitness"]) == 2 and len(recs[0]["add_s"]) == 2
    for oi in range(2):
        p = os.path.join(out, f"obj{oi:02d}_poses", "000001.txt")
        assert os.path.exists(p)
        assert np.loadtxt(p).shape == (4, 4)
