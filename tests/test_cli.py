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
