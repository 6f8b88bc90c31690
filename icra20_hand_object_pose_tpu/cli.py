"""Command-line driver — the rebuild's `main.cpp` (SURVEY.md §2 L5).

The reference ships a compiled binary driven by config.yaml that loops
over a recorded sequence and writes per-frame poses. Equivalent here:

    python -m icra20_hand_object_pose_tpu.cli track \
        --data <seq_dir> --object mesh.obj [--config cfg.yaml] --out out/
    python -m icra20_hand_object_pose_tpu.cli demo  [--frames 8] [--out out/]
    python -m icra20_hand_object_pose_tpu.cli eval  --poses out/poses.jsonl \
        --data <seq_dir> --object mesh.obj
    python -m icra20_hand_object_pose_tpu.cli bench

Outputs (SURVEY.md §6 metrics/observability): per-frame 4x4 pose text
files (reference-compatible), a structured metrics.jsonl, and a summary
table. `--profile DIR` wraps the run in a jax.profiler trace (Perfetto).
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np


def _load_cfg(args, camera=None):
    from .utils.config import EstimatorConfig, load_yaml

    if getattr(args, "config", None):
        cfg = load_yaml(args.config)
    else:
        cfg = EstimatorConfig()
    if camera is not None:
        import dataclasses
        cfg = dataclasses.replace(cfg, camera=camera)
    return cfg


def _make_hand(cfg):
    from .models import load_hand_spec, make_model_o_hand, make_t42_hand

    if not cfg.hand.enabled:
        return None
    spec = cfg.hand.spec
    if spec in ("", "t42"):
        return make_t42_hand()
    if spec == "model_o":
        return make_model_o_hand()
    return load_hand_spec(spec)


def _track_frames(est, frames, out_dir, log_every=1, overlays=False):
    """Shared tracking loop: frames is an iterable of objects with
    .depth/.hand_base/.hand_q/.pose_gt (pose_gt optional)."""
    import jax.numpy as jnp

    from .evaluation import (
        JsonlLogger, add_s_error, evaluate_trajectory, translation_error,
    )
    from .models import Tracker

    os.makedirs(out_dir, exist_ok=True)
    pose_dir = os.path.join(out_dir, "poses")
    os.makedirs(pose_dir, exist_ok=True)
    if overlays:
        from .visualize import save_overlay
        ov_dir = os.path.join(out_dir, "overlays")
        os.makedirs(ov_dir, exist_ok=True)
    tracker = Tracker(est)
    est_poses, gt_poses = [], []
    model_pts = np.asarray(est.obj.model_pts)
    t_total = 0.0
    with JsonlLogger(os.path.join(out_dir, "metrics.jsonl")) as log:
        for i, fr in enumerate(frames):
            hb = jnp.asarray(fr.hand_base) if fr.hand_base is not None else None
            hq = jnp.asarray(fr.hand_q) if fr.hand_q is not None else None
            t0 = time.perf_counter()
            out = tracker.step(jnp.asarray(fr.depth), hb, hq)
            dt = time.perf_counter() - t0
            t_total += dt
            pose = np.asarray(out.pose)
            est_poses.append(pose)
            np.savetxt(os.path.join(pose_dir, f"{i:06d}.txt"), pose, fmt="%.9g")
            rec = dict(
                frame=i, ms=dt * 1000.0,
                fitness=float(out.fitness), coverage=float(out.coverage),
                reinitialized=bool(out.reinitialized),
                pose=pose,
            )
            if fr.pose_gt is not None:
                gt_poses.append(np.asarray(fr.pose_gt))
                rec["add_s"] = add_s_error(pose, fr.pose_gt, model_pts)
                rec["trans_err"] = translation_error(pose, fr.pose_gt)
            log.log(**rec)
            if overlays:
                save_overlay(
                    os.path.join(ov_dir, f"overlay_{i:06d}.png"),
                    np.asarray(fr.depth), pose, est.obj, est.cfg.camera,
                    hand=est.hand,
                    hand_base=np.asarray(fr.hand_base) if fr.hand_base is not None else None,
                    hand_q=np.asarray(fr.hand_q) if fr.hand_q is not None else None,
                    rgb=getattr(fr, "rgb", None),
                )
            if log_every and i % log_every == 0:
                extra = (
                    f" ADD-S={rec['add_s']*1000:.2f}mm" if "add_s" in rec else ""
                )
                print(
                    f"frame {i}: {dt*1000:.0f}ms fit={rec['fitness']:.3f}"
                    f" cov={rec['coverage']:.3f}"
                    f"{' REINIT' if rec['reinitialized'] else ''}{extra}",
                    flush=True,
                )
    summary = None
    if gt_poses and len(gt_poses) == len(est_poses):
        summary = evaluate_trajectory(
            est_poses, gt_poses, model_pts, est.obj.diameter,
            mesh=est.obj.mesh,
        )
        print(summary)
        with open(os.path.join(out_dir, "summary.json"), "w") as f:
            json.dump(summary.to_dict(), f, indent=2)
    n = len(est_poses)
    print(f"{n} frames in {t_total:.2f}s ({t_total/max(n,1)*1000:.0f} ms/frame)"
          f" -> {out_dir}")
    return summary


def cmd_track(args):
    from .datasets.sequence import RecordedSequence
    from .models import Estimator, ObjectModel

    seq = RecordedSequence(args.data)
    cfg = _load_cfg(args, camera=seq.camera)
    obj = ObjectModel.load(args.object, model_points=cfg.model_points)
    est = Estimator(obj, _make_hand(cfg), cfg)
    _track_frames(est, seq, args.out, overlays=args.overlays)
    return 0


def cmd_demo(args):
    """Self-contained: synthesize a grasp sequence, save it in the
    recorded layout, track it back through the full IO path."""
    import dataclasses

    from .datasets import SyntheticSequenceConfig, generate_sequence
    from .datasets.sequence import RecordedSequence, save_sequence
    from .models import Estimator, ObjectModel
    from .utils import meshio
    from .utils.config import CameraIntrinsics

    cam = CameraIntrinsics(width=args.width, height=args.height,
                           fx=0.9 * args.width, fy=0.9 * args.width,
                           cx=args.width / 2, cy=args.height / 2)
    cfg = _load_cfg(args, camera=cam)
    if args.particles:
        cfg = dataclasses.replace(
            cfg,
            pso=dataclasses.replace(cfg.pso, particles=args.particles),
            tracker=dataclasses.replace(
                cfg.tracker, reinit_particles=2 * args.particles
            ),
        )
    mesh = meshio.make_test_object(args.shape)
    hand = _make_hand(cfg)
    frames = generate_sequence(
        mesh, hand, SyntheticSequenceConfig(n_frames=args.frames, camera=cam)
    )
    seq_dir = os.path.join(args.out, "sequence")
    save_sequence(frames, cam, seq_dir)
    seq = RecordedSequence(seq_dir)
    obj = ObjectModel(mesh, model_points=cfg.model_points)
    est = Estimator(obj, hand, cfg)
    _track_frames(est, seq, args.out, overlays=args.overlays)
    return 0


def cmd_eval(args):
    from .datasets.sequence import RecordedSequence
    from .evaluation import evaluate_trajectory
    from .models import ObjectModel
    from .parity import compare_pose_sequences, load_pose_dump

    if not os.path.exists(args.poses):
        print(f"error: --poses path not found: {args.poses}", file=sys.stderr)
        return 2
    seq = RecordedSequence(args.data)
    obj = ObjectModel.load(args.object)
    est_poses = load_pose_dump(args.poses)
    if getattr(args, "ref_poses", None):
        # parity vs a reference implementation's pose dump (BASELINE
        # "identical poses" target; harness in parity.py)
        rep = compare_pose_sequences(
            est_poses, load_pose_dump(args.ref_poses),
            np.asarray(obj.model_pts),
        )
        print(rep)
    gt = [seq[i].pose_gt for i in range(len(seq))]
    if any(g is None for g in gt):
        print("sequence has no ground truth", file=sys.stderr)
        return 1
    summary = evaluate_trajectory(
        est_poses, gt, np.asarray(obj.model_pts), obj.diameter, mesh=obj.mesh
    )
    print(summary)
    print(json.dumps(summary.to_dict()))
    return 0


def cmd_sweep(args):
    """Track a model library concurrently: one sequence per object, all
    stepped as ONE device program (BASELINE config 5; LibrarySweep).
    On a multi-chip mesh the object axis shards over devices."""
    import jax
    import jax.numpy as jnp

    from .datasets.sequence import RecordedSequence
    from .evaluation import JsonlLogger, add_s_error
    from .models import ObjectModel
    from .parallel import LibrarySweep, make_mesh

    if len(args.data) != len(args.object):
        print(f"error: {len(args.data)} sequences vs {len(args.object)} "
              f"objects", file=sys.stderr)
        return 2
    seqs = [RecordedSequence(d) for d in args.data]
    cams = {(s.camera.width, s.camera.height, s.camera.fx) for s in seqs}
    if len(cams) != 1:
        print("error: sequences must share camera intrinsics", file=sys.stderr)
        return 2
    n_frames = min(len(s) for s in seqs)
    cfg = _load_cfg(args, camera=seqs[0].camera)
    objs = [
        ObjectModel.load(p, model_points=cfg.model_points) for p in args.object
    ]
    mesh = make_mesh(axis_name="obj") if args.shard and jax.device_count() > 1 else None
    sweep = LibrarySweep(objs, _make_hand(cfg), cfg, mesh=mesh)
    st = sweep.init_state()
    os.makedirs(args.out, exist_ok=True)
    pose_dirs = []
    for i in range(len(objs)):
        d = os.path.join(args.out, f"obj{i:02d}_poses")
        os.makedirs(d, exist_ok=True)
        pose_dirs.append(d)
    t_total = 0.0
    with JsonlLogger(os.path.join(args.out, "metrics.jsonl")) as log:
        for fi in range(n_frames):
            frames = [s[fi] for s in seqs]
            depths = jnp.stack([jnp.asarray(f.depth) for f in frames])
            hbs = jnp.stack([
                jnp.asarray(f.hand_base) if f.hand_base is not None
                else jnp.eye(4) for f in frames
            ])
            hq0 = next((f.hand_q for f in frames if f.hand_q is not None), None)
            hqs = (
                jnp.stack([
                    jnp.asarray(f.hand_q) if f.hand_q is not None
                    else jnp.zeros_like(jnp.asarray(hq0)) for f in frames
                ]) if hq0 is not None else None
            )
            t0 = time.perf_counter()
            st, res = sweep.step(st, depths, hbs, hqs)
            poses = np.asarray(res.poses)
            dt = time.perf_counter() - t0
            t_total += dt
            rec = dict(frame=fi, ms=dt * 1000.0,
                       fitness=np.asarray(res.fitness).tolist(),
                       reinitialized=np.asarray(res.reinitialized).tolist())
            adds = []
            for oi, (f, obj) in enumerate(zip(frames, objs)):
                np.savetxt(os.path.join(pose_dirs[oi], f"{fi:06d}.txt"),
                           poses[oi], fmt="%.9g")
                if f.pose_gt is not None:
                    adds.append(add_s_error(
                        poses[oi], f.pose_gt, np.asarray(obj.model_pts)))
            if adds:
                rec["add_s"] = adds
            log.log(**rec)
            extra = (
                " ADD-S[mm]=" + ",".join(f"{a*1000:.1f}" for a in adds)
                if adds else ""
            )
            print(f"frame {fi}: {dt*1000:.0f}ms {len(objs)} objects{extra}",
                  flush=True)
    print(f"{n_frames} frames x {len(objs)} objects in {t_total:.2f}s "
          f"({t_total/max(n_frames,1)*1000:.0f} ms/frame) -> {args.out}")
    return 0


def cmd_bench(args):
    from . import benchmarks  # packaged: works for installed wheels too

    benchmarks.main()


def main(argv=None):
    from .utils.jaxcache import enable_compilation_cache

    enable_compilation_cache()
    ap = argparse.ArgumentParser(
        prog="icra20_hand_object_pose_tpu",
        description=__doc__, formatter_class=argparse.RawDescriptionHelpFormatter,
    )
    ap.add_argument("--profile", metavar="DIR", default=None,
                    help="write a jax.profiler trace (Perfetto) to DIR")
    sub = ap.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("track", help="track an object through a recorded sequence")
    p.add_argument("--data", required=True, help="sequence directory")
    p.add_argument("--object", required=True, help="object mesh (.obj/.ply)")
    p.add_argument("--config", default=None, help="YAML config")
    p.add_argument("--out", default="out", help="output directory")
    p.add_argument("--overlays", action="store_true",
                   help="save per-frame overlay PNGs")
    p.set_defaults(fn=cmd_track)

    p = sub.add_parser("demo", help="synthetic grasp sequence end-to-end")
    p.add_argument("--frames", type=int, default=8)
    p.add_argument("--shape", default="box",
                   choices=["box", "cylinder", "sphere"])
    p.add_argument("--width", type=int, default=320)
    p.add_argument("--height", type=int, default=240)
    p.add_argument("--particles", type=int, default=None)
    p.add_argument("--config", default=None)
    p.add_argument("--out", default="out_demo")
    p.add_argument("--overlays", action="store_true",
                   help="save per-frame overlay PNGs")
    p.set_defaults(fn=cmd_demo)

    p = sub.add_parser("eval", help="score saved poses against ground truth")
    p.add_argument("--poses", required=True,
                   help="metrics.jsonl or a directory of 4x4 .txt files")
    p.add_argument("--data", required=True)
    p.add_argument("--object", required=True)
    p.add_argument("--ref-poses", default=None,
                   help="reference pose dump (dir/.jsonl/.txt/.npy) for a "
                        "parity report vs another implementation")
    p.set_defaults(fn=cmd_eval)

    p = sub.add_parser(
        "sweep", help="track a model library concurrently (one device program)"
    )
    p.add_argument("--data", action="append", required=True,
                   help="sequence directory (repeat, one per object)")
    p.add_argument("--object", action="append", required=True,
                   help="object mesh (repeat, paired with --data by order)")
    p.add_argument("--config", default=None)
    p.add_argument("--out", default="out_sweep")
    p.add_argument("--shard", action="store_true",
                   help="shard the object axis over all local devices")
    p.set_defaults(fn=cmd_sweep)

    p = sub.add_parser("bench", help="run the headline benchmark")
    p.set_defaults(fn=cmd_bench)

    args = ap.parse_args(argv)
    if args.profile:
        import jax

        os.makedirs(args.profile, exist_ok=True)
        with jax.profiler.trace(args.profile):
            return args.fn(args)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main() or 0)
