"""Driver shim: delegates to the packaged benchmark module.

Keeping the logic in `icra20_hand_object_pose_tpu.benchmarks` means an
installed package can run `... cli bench` without a repo checkout; the
driver keeps invoking `python bench.py` here.
"""
from icra20_hand_object_pose_tpu import benchmarks

if __name__ == "__main__":
    benchmarks.cli()
