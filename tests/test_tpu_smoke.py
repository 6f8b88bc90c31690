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
"""


def test_pallas_kernels_on_chip():
    env = dict(os.environ)
    # drop the CPU-forcing knobs the suite may have injected
    env.pop("JAX_PLATFORMS", None)
    r = subprocess.run(
        [sys.executable, "-c", _SCRIPT],
        capture_output=True, text=True, timeout=900,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        env=env,
    )
    out = r.stdout + r.stderr
    if "NOTPU" in out:
        pytest.skip(f"no TPU backend available: {out.splitlines()[0]}")
    assert r.returncode == 0, out[-3000:]
    assert "TPU_SMOKE_OK" in out, out[-3000:]
