"""On-chip Pallas kernel smoke test (VERDICT r1: interpreter mode accepts
programs the real Mosaic compiler rejects, so kernel regressions must be
caught on the actual TPU, not only on the CPU mesh).

The suite's conftest pins this process to a virtual CPU mesh, so the
check runs in a SUBPROCESS with the default backend: if that backend is
not a TPU the test skips; on a TPU machine it compiles both flagship
kernels (nn_batched, nn_gather_batched) on the chip and verifies them
against the dense jnp oracle."""
import os
import subprocess
import sys

import pytest

_SCRIPT = r"""
import jax
if jax.default_backend() != "tpu":
    print("NOTPU", jax.default_backend())
    raise SystemExit(0)
import jax.numpy as jnp
import numpy as np
from icra20_hand_object_pose_tpu.ops import knn, knn_pallas

k1, k2, k3 = jax.random.split(jax.random.key(0), 3)
P, Ns, Nm = 4, 512, 384          # deliberately non-multiple of tile_m
scene = jax.random.uniform(k1, (Ns, 3), minval=-0.3, maxval=0.3)
pts = jax.random.uniform(k2, (P, Nm, 3), minval=-0.3, maxval=0.3)
nrm = jax.random.normal(k3, (P, Nm, 3))
nrm = nrm / jnp.linalg.norm(nrm, axis=-1, keepdims=True)

idx, d2 = knn_pallas.nn_batched(scene[None], pts, interpret=False)
# dense oracle
d2_ref = jnp.min(
    jnp.sum((scene[None, :, None, :] - pts[:, None, :, :]) ** 2, -1), -1)
idx_ref = jnp.argmin(
    jnp.sum((scene[None, :, None, :] - pts[:, None, :, :]) ** 2, -1), -1)
assert np.array_equal(np.asarray(idx), np.asarray(idx_ref)), "argmin mismatch"
assert np.allclose(np.asarray(d2), np.asarray(d2_ref), atol=1e-6)

m, mn, d2g, idxg = knn_pallas.nn_gather_batched(
    scene[None], pts, nrm, interpret=False)
assert np.array_equal(np.asarray(idxg), np.asarray(idx_ref))
g = np.take_along_axis(np.asarray(pts), np.asarray(idx_ref)[..., None], 1)
assert np.allclose(np.asarray(m), g, atol=2e-6), "gather mismatch"
print("TPU_SMOKE_OK")

# The COMPOSED frame program (kernels + MXU gathers + splats + scan)
# must also lower on the real chip: a Mosaic/layout regression in the
# composition would otherwise be caught first by the driver's graft
# check, not the suite (VERDICT r2 item 7). Tiny shapes keep the
# on-chip compile to a few seconds.
from icra20_hand_object_pose_tpu.datasets import (
    default_object_pose, hand_base_for_grasp, render_frame_fast,
)
from icra20_hand_object_pose_tpu.models import (
    Estimator, ObjectModel, make_t42_hand,
)
from icra20_hand_object_pose_tpu.utils import meshio
from icra20_hand_object_pose_tpu.utils.config import (
    CameraIntrinsics, EstimatorConfig, PsoConfig,
)

cam = CameraIntrinsics(width=160, height=120, fx=140.0, fy=140.0,
                       cx=80.0, cy=60.0)
cfg = EstimatorConfig(camera=cam, scene_points=512, render_size=120,
                      pso=PsoConfig(particles=32, iters=2))
mesh = meshio.make_test_object("box")
hand = make_t42_hand(points_per_link=64)
est = Estimator(ObjectModel(mesh, model_points=256, render_points=512),
                hand, cfg)
pose = default_object_pose()
hb = hand_base_for_grasp(pose)
hq = np.asarray([0.45, 0.45], np.float32)
depth = render_frame_fast(mesh, pose, hand, hb, hq, cam)
out = est.estimate(jnp.asarray(depth), jnp.asarray(pose), jnp.asarray(hb),
                   jnp.asarray(hq), key=jax.random.key(0))
err = float(jnp.linalg.norm(out.pose[:3, 3] - pose[:3, 3]))
assert err < 0.05, f"tiny frame step diverged on chip: {err}"
print("TPU_FRAME_OK")
"""


def test_pallas_kernels_on_chip():
    env = dict(os.environ)
    # drop the CPU-forcing knobs the suite may have injected
    env.pop("JAX_PLATFORMS", None)
    try:
        # Generous bound: compiles through the axon tunnel are 40-380 s
        # EACH on a cold cache (CLAUDE.md), and this subprocess compiles
        # the two kernels plus a tiny composed frame program. A
        # cache-warm run finishes in well under a minute.
        r = subprocess.run(
            [sys.executable, "-c", _SCRIPT],
            capture_output=True, text=True, timeout=1800,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            env=env,
        )
    except subprocess.TimeoutExpired as e:
        pytest.fail(
            "on-chip smoke test exceeded 1800 s — even a cold compile "
            "cache should fit; treat as a real lowering hang/regression. "
            f"partial output: {(e.stdout or b'')[-2000:]}"
        )
    out = r.stdout + r.stderr
    if "NOTPU" in out:
        pytest.skip(f"no TPU backend available: {out.splitlines()[0]}")
    assert r.returncode == 0, out[-3000:]
    assert "TPU_SMOKE_OK" in out, out[-3000:]
    assert "TPU_FRAME_OK" in out, out[-3000:]
