#!/usr/bin/env python
"""Convert a released reference-style RGB-D grasp sequence into this
repo's recorded-sequence layout (datasets/sequence.py docstring).

The reference's released dataset (SURVEY.md §3 "Dataset I/O": 16-bit
depth PNGs + RGB + ground-truth poses + camera intrinsics, objects
grasped by an OpenHand T42) has not been reachable in this environment
(empty /root/reference mount, no network), so the exact directory names
are configurable flags with defaults matching the common layout of that
project family:

    <src>/cam_K.txt           (or --cam-k)
    <src>/depth/*.png         16-bit depth (millimeters by default)
    <src>/rgb/*.png           8-bit color (optional)
    <src>/annotated_poses/*.txt | poses/*.txt   4x4 object pose (optional)
    <src>/hand_pose/*.txt     4x4 hand base pose (optional)

Output is a sequence directory this repo's RecordedSequence loads
directly. Frames are matched per-stream by SORTED order (not by
filename equality) so heterogeneous numbering schemes still pair up;
a count mismatch across streams is an error.

Usage:
    python scripts/convert_reference_dataset.py --src SEQ --dst OUT \
        [--depth-glob 'depth/*.png'] [--rgb-glob 'rgb/*.png'] \
        [--pose-glob 'annotated_poses/*.txt'] [--hand-glob 'hand_pose/*.txt'] \
        [--cam-k cam_K.txt] [--depth-scale 1e-3]
"""
from __future__ import annotations

import argparse
import glob
import json
import os
import shutil
import sys

import numpy as np


def _collect(src: str, pattern: str | None) -> list[str]:
    if not pattern:
        return []
    return sorted(glob.glob(os.path.join(src, pattern)))


def convert(
    src: str,
    dst: str,
    depth_glob: str = "depth/*.png",
    rgb_glob: str = "rgb/*.png",
    pose_glob: str = "annotated_poses/*.txt",
    hand_glob: str = "hand_pose/*.txt",
    hand_q_glob: str = "hand_q/*.txt",
    cam_k: str = "cam_K.txt",
    depth_scale: float = 1e-3,
) -> int:
    """Returns the number of frames converted."""
    depths = _collect(src, depth_glob)
    if not depths:
        raise FileNotFoundError(f"no depth frames match {depth_glob!r} in {src}")
    rgbs = _collect(src, rgb_glob)
    poses = _collect(src, pose_glob)
    if not poses and pose_glob == "annotated_poses/*.txt":
        poses = _collect(src, "poses/*.txt")  # alternate common name
    hands = _collect(src, hand_glob)
    hand_qs = _collect(src, hand_q_glob)
    for name, files in [("rgb", rgbs), ("pose", poses), ("hand", hands),
                        ("hand_q", hand_qs)]:
        if files and len(files) != len(depths):
            raise ValueError(
                f"{name} stream has {len(files)} frames vs {len(depths)} depth"
            )

    kpath = os.path.join(src, cam_k)
    if not os.path.exists(kpath):
        raise FileNotFoundError(f"camera intrinsics not found: {kpath}")
    K = np.loadtxt(kpath).reshape(3, 3)

    os.makedirs(dst, exist_ok=True)
    np.savetxt(os.path.join(dst, "cam_K.txt"), K, fmt="%.9g")
    with open(os.path.join(dst, "meta.json"), "w") as f:
        json.dump({"depth_scale": depth_scale, "source": os.path.abspath(src)}, f)
    for sub, files in [("depth", depths), ("rgb", rgbs)]:
        if files:
            os.makedirs(os.path.join(dst, sub), exist_ok=True)
            for i, p in enumerate(files):
                shutil.copyfile(p, os.path.join(dst, sub, f"{i:06d}.png"))
    for sub, files, shape in [("pose_gt", poses, (4, 4)),
                              ("hand_base", hands, (4, 4)),
                              ("hand_q", hand_qs, None)]:
        if files:
            os.makedirs(os.path.join(dst, sub), exist_ok=True)
            for i, p in enumerate(files):
                m = np.loadtxt(p)
                if shape is not None:
                    m = m.reshape(shape)
                else:
                    m = m.reshape(1, -1)
                np.savetxt(os.path.join(dst, sub, f"{i:06d}.txt"), m, fmt="%.9g")
    return len(depths)


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--src", required=True)
    ap.add_argument("--dst", required=True)
    ap.add_argument("--depth-glob", default="depth/*.png")
    ap.add_argument("--rgb-glob", default="rgb/*.png")
    ap.add_argument("--pose-glob", default="annotated_poses/*.txt")
    ap.add_argument("--hand-glob", default="hand_pose/*.txt")
    ap.add_argument("--hand-q-glob", default="hand_q/*.txt")
    ap.add_argument("--cam-k", default="cam_K.txt")
    ap.add_argument("--depth-scale", type=float, default=1e-3)
    a = ap.parse_args(argv)
    n = convert(
        a.src, a.dst, a.depth_glob, a.rgb_glob, a.pose_glob, a.hand_glob,
        a.hand_q_glob, a.cam_k, a.depth_scale,
    )
    print(f"converted {n} frames -> {a.dst}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
