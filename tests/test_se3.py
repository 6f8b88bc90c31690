"""SE(3)/SO(3) math unit tests vs scipy oracle (SURVEY.md §5.1)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.spatial.transform import Rotation as Rsp

from icra20_hand_object_pose_tpu.utils import se3


def rand_rotations(n, seed=0):
    return Rsp.random(n, random_state=seed)


def test_quat_matrix_roundtrip():
    rs = rand_rotations(64)
    # scipy quats are xyzw; ours wxyz
    q_sp = rs.as_quat()
    q = jnp.asarray(np.concatenate([q_sp[:, 3:4], q_sp[:, :3]], axis=1))
    R = se3.quat_to_matrix(q)
    np.testing.assert_allclose(np.asarray(R), rs.as_matrix(), atol=1e-5)
    q2 = se3.matrix_to_quat(R)
    # sign-canonicalized comparison
    qc = np.asarray(q) * np.sign(np.asarray(q)[:, :1])
    np.testing.assert_allclose(np.asarray(q2), qc, atol=1e-5)


def test_matrix_to_quat_edge_cases():
    # identity, 180-degree rotations about each axis
    mats = [np.eye(3)]
    for axis in np.eye(3):
        mats.append(Rsp.from_rotvec(np.pi * axis).as_matrix())
    for m in mats:
        q = se3.matrix_to_quat(jnp.asarray(m, jnp.float32))
        R2 = se3.quat_to_matrix(q)
        np.testing.assert_allclose(np.asarray(R2), m, atol=1e-5)


def test_so3_exp_log_roundtrip():
    rng = np.random.default_rng(1)
    w = rng.normal(size=(128, 3))
    # log returns the principal value, so keep |w| < pi for the roundtrip
    w = w / np.linalg.norm(w, axis=-1, keepdims=True) * rng.uniform(0.01, 3.1, (128, 1))
    R = se3.so3_exp(jnp.asarray(w, jnp.float32))
    np.testing.assert_allclose(
        np.asarray(R), Rsp.from_rotvec(w).as_matrix(), atol=1e-5
    )
    w2 = se3.so3_log(R)
    np.testing.assert_allclose(np.asarray(w2), w, atol=1e-4)


def test_so3_small_angle():
    w = jnp.asarray([[1e-9, 0, 0], [0, 0, 0]], jnp.float32)
    R = se3.so3_exp(w)
    np.testing.assert_allclose(np.asarray(R), np.stack([np.eye(3)] * 2), atol=1e-6)
    assert np.all(np.isfinite(np.asarray(se3.so3_log(R))))
    # gradient must be finite at 0
    g = jax.grad(lambda x: jnp.sum(se3.so3_exp(x)))(jnp.zeros(3))
    assert np.all(np.isfinite(np.asarray(g)))


def test_se3_exp_log_roundtrip():
    rng = np.random.default_rng(2)
    xi = rng.normal(size=(64, 6))
    wn = np.linalg.norm(xi[:, :3], axis=-1, keepdims=True)
    xi[:, :3] *= np.minimum(wn, 3.0) / wn  # keep rotation within principal domain
    xi = jnp.asarray(xi, jnp.float32)
    T = se3.se3_exp(xi)
    # valid rigid transform
    R = np.asarray(se3.rotation(T))
    np.testing.assert_allclose(R @ R.transpose(0, 2, 1), np.stack([np.eye(3)] * 64), atol=1e-5)
    xi2 = se3.se3_log(T)
    np.testing.assert_allclose(np.asarray(xi2), np.asarray(xi), atol=1e-4)


def test_compose_inverse():
    rng = np.random.default_rng(3)
    xi = jnp.asarray(rng.normal(size=(8, 6)), jnp.float32)
    T = se3.se3_exp(xi)
    I = se3.compose(T, se3.inverse(T))
    np.testing.assert_allclose(np.asarray(I), np.stack([np.eye(4)] * 8), atol=1e-5)


def test_transform_points_matches_matmul():
    rng = np.random.default_rng(4)
    T = se3.se3_exp(jnp.asarray(rng.normal(size=6), jnp.float32))
    pts = jnp.asarray(rng.normal(size=(100, 3)), jnp.float32)
    out = se3.transform_points(T, pts)
    Tn = np.asarray(T)
    expect = pts @ Tn[:3, :3].T + Tn[:3, 3]
    np.testing.assert_allclose(np.asarray(out), expect, atol=1e-5)


def test_random_quat_uniformity():
    q = se3.random_quat(jax.random.key(0), (2000,))
    norms = np.linalg.norm(np.asarray(q), axis=-1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-5)
    # mean rotation angle from identity for uniform rotations ~ 126.47 deg
    ang = np.degrees(2 * np.arccos(np.abs(np.asarray(q)[:, 0])))
    assert 115 < ang.mean() < 140


def test_perturb_pose_scale():
    T0 = se3.identity_pose()
    Ts = se3.perturb_pose(jax.random.key(1), T0, 0.1, 0.01, (512,))
    ang = np.asarray(se3.rotation_angle_deg(se3.rotation(Ts), jnp.eye(3)))
    # chi(3) mean with sigma=0.1 rad ~ 0.1*1.6 rad ~ 9.1 deg
    assert 6 < ang.mean() < 13
    t = np.asarray(se3.translation(Ts))
    assert 0.005 < np.linalg.norm(t, axis=-1).mean() < 0.03


def test_add_s_zero_for_equal_poses():
    m = jnp.asarray(np.random.default_rng(5).normal(size=(50, 3)), jnp.float32)
    T = se3.se3_exp(jnp.asarray([0.3, -0.2, 0.1, 0.05, 0.02, -0.04], jnp.float32))
    assert float(se3.add_s_error(T, T, m)) < 1e-6
    assert float(se3.add_error(T, T, m)) < 1e-6


def test_add_s_translation_sensitivity():
    m = jnp.asarray(np.random.default_rng(6).normal(size=(50, 3)), jnp.float32)
    T0 = se3.identity_pose()
    T1 = se3.make_pose(jnp.eye(3), jnp.asarray([0.01, 0, 0]))
    err = float(se3.add_error(T1, T0, m))
    np.testing.assert_allclose(err, 0.01, atol=1e-6)
    assert float(se3.add_s_error(T1, T0, m)) <= err + 1e-6


def test_super_fibonacci_rotations_valid_and_covering():
    """Grid rotations are orthonormal and cover SO(3) with smaller worst
    gaps than iid sampling at the same count (the property global init
    relies on)."""
    import jax

    n = 256
    R = np.asarray(se3.super_fibonacci_rotations(n))
    eye = np.einsum("nij,nkj->nik", R, R)
    np.testing.assert_allclose(eye, np.tile(np.eye(3), (n, 1, 1)), atol=1e-5)
    assert np.allclose(np.linalg.det(R), 1.0, atol=1e-5)

    probes = np.asarray(se3.random_rotation(jax.random.key(7), (512,)))
    rand = np.asarray(se3.random_rotation(jax.random.key(8), (n,)))

    def worst_gap_deg(grid):
        # geodesic distance via trace; worst probe's nearest grid point
        tr = np.einsum("pij,nij->pn", probes, grid)
        cos = np.clip((tr - 1.0) / 2.0, -1.0, 1.0)
        return np.degrees(np.arccos(cos).min(axis=1).max())

    assert worst_gap_deg(R) < worst_gap_deg(rand)
    assert worst_gap_deg(R) < 45.0

    # random offset keeps validity and changes the set
    R2 = np.asarray(se3.super_fibonacci_rotations(n, jax.random.key(3)))
    assert not np.allclose(R2, R)
    np.testing.assert_allclose(
        np.einsum("nij,nkj->nik", R2, R2), np.tile(np.eye(3), (n, 1, 1)),
        atol=1e-5,
    )
