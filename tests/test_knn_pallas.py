"""Fused Pallas NN kernel vs the dense jnp oracle (SURVEY.md §8 hard
part 2). Runs in interpreter mode on the CPU test mesh; the same code
compiles on TPU."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from icra20_hand_object_pose_tpu.ops import knn, knn_pallas


def rand_clouds(key, P, Ns, Nm, scale=0.3):
    kq, kr = jax.random.split(key)
    q = jax.random.uniform(kq, (P, Ns, 3), minval=-scale, maxval=scale)
    r = jax.random.uniform(kr, (P, Nm, 3), minval=-scale, maxval=scale)
    return q, r


@pytest.mark.parametrize("P,Ns,Nm", [(1, 64, 128), (2, 100, 200), (3, 256, 1024)])
def test_matches_dense(P, Ns, Nm):
    q, r = rand_clouds(jax.random.key(0), P, Ns, Nm)
    idx, d2 = knn_pallas.nn_batched(q, r, tile_s=64, tile_m=128, interpret=True)
    for p in range(P):
        ref_idx, ref_d2 = knn.nn(q[p], r[p])
        # ties can differ in index; distances must agree
        np.testing.assert_allclose(np.asarray(d2[p]), np.asarray(ref_d2),
                                   rtol=1e-3, atol=1e-7)
        agree = np.mean(np.asarray(idx[p]) == np.asarray(ref_idx))
        assert agree > 0.99, agree


def test_unaligned_sizes_padded_correctly():
    """Ns/Nm not multiples of the tiles: padding refs must never win."""
    q, r = rand_clouds(jax.random.key(1), 1, 37, 73)
    idx, d2 = knn_pallas.nn_batched(q, r, tile_s=32, tile_m=64, interpret=True)
    assert int(jnp.max(idx)) < 73
    ref_idx, ref_d2 = knn.nn(q[0], r[0])
    np.testing.assert_allclose(np.asarray(d2[0]), np.asarray(ref_d2),
                               rtol=1e-3, atol=1e-7)


def test_nn_fn_under_vmap_in_icp():
    """The make_nn_fn drop-in must work inside the vmapped ICP."""
    from icra20_hand_object_pose_tpu.ops import icp
    from icra20_hand_object_pose_tpu.utils import meshio, se3

    mesh = meshio.make_test_object("box")
    mpts, mnrm = mesh.sample_surface(128, seed=0)
    mpts, mnrm = jnp.asarray(mpts), jnp.asarray(mnrm)
    T_gt = se3.make_pose(jnp.eye(3), jnp.asarray([0.0, 0.0, 0.4]))
    scene = se3.transform_points(T_gt, mpts)
    snrm = se3.rotate_vectors(T_gt, mnrm)
    w = jnp.ones(scene.shape[0])

    keys = jax.random.split(jax.random.key(2), 4)
    poses0 = jax.vmap(lambda k: se3.perturb_pose(k, T_gt, 0.05, 0.008))(keys)

    nn_fn = knn_pallas.make_nn_fn(tile_s=64, tile_m=64, interpret=True)
    refined, stats = icp.icp_batched(
        poses0, scene, snrm, w, mpts, mnrm,
        iters=10, max_corresp_dist=0.05, nn_fn=nn_fn,
    )
    errs = jax.vmap(lambda T: se3.add_error(T, T_gt, mpts))(refined)
    assert float(jnp.max(errs)) < 0.002, np.asarray(errs)


def test_exact_distances_value():
    """Hand-checkable tiny case."""
    q = jnp.asarray([[[0.0, 0.0, 0.0], [1.0, 0.0, 0.0]]])
    r = jnp.asarray([[[0.0, 0.0, 0.1], [1.0, 0.0, 0.2], [5.0, 5.0, 5.0]]])
    idx, d2 = knn_pallas.nn_batched(q, r, tile_s=8, tile_m=128, interpret=True)
    np.testing.assert_array_equal(np.asarray(idx[0]), [0, 1])
    np.testing.assert_allclose(np.asarray(d2[0]), [0.01, 0.04], rtol=1e-5)


def test_shared_query_batch():
    """query [1,Ns,3] + ref [P,Nm,3]: scene shared across particles."""
    kq, kr = jax.random.split(jax.random.key(3))
    q = jax.random.uniform(kq, (1, 50, 3), minval=-0.3, maxval=0.3)
    r = jax.random.uniform(kr, (3, 80, 3), minval=-0.3, maxval=0.3)
    idx, d2 = knn_pallas.nn_batched(q, r, tile_s=64, tile_m=64, interpret=True)
    assert idx.shape == (3, 50)
    for p in range(3):
        ref_idx, ref_d2 = knn.nn(q[0], r[p])
        np.testing.assert_allclose(np.asarray(d2[p]), np.asarray(ref_d2),
                                   rtol=1e-3, atol=1e-7)


def test_corr_fn_matches_gathers():
    """Fused NN+gather kernel == NN + XLA take_along_axis."""
    kq, kr, kn = jax.random.split(jax.random.key(5), 3)
    q = jax.random.uniform(kq, (40, 3), minval=-0.3, maxval=0.3)
    r = jax.random.uniform(kr, (3, 70, 3), minval=-0.3, maxval=0.3)
    rn = jax.random.normal(kn, (3, 70, 3))
    corr = knn_pallas.make_corr_fn(tile_s=64, tile_m=64, interpret=True)
    matched, mnorm, d2, idx = corr(q, r, rn)
    for p in range(3):
        ref_idx, ref_d2 = knn.nn(q, r[p])
        np.testing.assert_allclose(np.asarray(d2[p]), np.asarray(ref_d2),
                                   rtol=1e-3, atol=1e-7)
        np.testing.assert_allclose(
            np.asarray(matched[p]), np.asarray(r[p][ref_idx]), atol=5e-6)
        np.testing.assert_allclose(
            np.asarray(mnorm[p]), np.asarray(rn[p][ref_idx]), atol=5e-4)


def test_icp_with_corr_fn():
    from icra20_hand_object_pose_tpu.ops import icp
    from icra20_hand_object_pose_tpu.utils import meshio, se3

    mesh = meshio.make_test_object("box")
    mpts, mnrm = mesh.sample_surface(128, seed=0)
    mpts, mnrm = jnp.asarray(mpts), jnp.asarray(mnrm)
    T_gt = se3.make_pose(jnp.eye(3), jnp.asarray([0.0, 0.0, 0.4]))
    scene = se3.transform_points(T_gt, mpts)
    snrm = se3.rotate_vectors(T_gt, mnrm)
    w = jnp.ones(scene.shape[0])
    keys = jax.random.split(jax.random.key(6), 4)
    poses0 = jax.vmap(lambda k: se3.perturb_pose(k, T_gt, 0.05, 0.008))(keys)
    corr = knn_pallas.make_corr_fn(tile_s=128, tile_m=128, interpret=True)
    refined, _ = icp.icp_batched(
        poses0, scene, snrm, w, mpts, mnrm,
        iters=10, max_corresp_dist=0.05, corr_fn=corr)
    errs = jax.vmap(lambda T: se3.add_error(T, T_gt, mpts))(refined)
    assert float(jnp.max(errs)) < 0.002, np.asarray(errs)


def test_gn_kernel_matches_xla_build():
    """Fused NN+GN kernel == NN + correspondence gates + the XLA H/g
    build (VERDICT r3 item 6): H, g, inlier mass, support hits, and the
    weighted residual power must all agree with the oracle composition."""
    import math
    kq, kr, kn, ksn, kw = jax.random.split(jax.random.key(7), 5)
    P, Ns, Nm = 3, 90, 130
    scene_c = jax.random.uniform(kq, (Ns, 3), minval=-0.2, maxval=0.2)
    scene_n = jax.random.normal(ksn, (Ns, 3))
    scene_n = scene_n / jnp.linalg.norm(scene_n, axis=-1, keepdims=True)
    scene_n = scene_n.at[::7].set(0.0)         # padding-style zero normals
    scene_w = (jax.random.uniform(kw, (Ns,)) > 0.2).astype(jnp.float32)
    ref_c = jax.random.uniform(kr, (P, Nm, 3), minval=-0.2, maxval=0.2)
    ref_n = jax.random.normal(kn, (P, Nm, 3))
    ref_n = ref_n / jnp.linalg.norm(ref_n, axis=-1, keepdims=True)
    maxd2, tau2 = 0.05 ** 2, 0.03 ** 2
    min_cos = math.cos(math.radians(60.0))
    H, g, wsum, hits, wrr = knn_pallas.nn_gn_batched(
        scene_c, scene_n, scene_w, ref_c, ref_n,
        maxd2=maxd2, min_cos=min_cos, tau2=tau2,
        tile_s=64, tile_m=64, interpret=True,
    )
    from icra20_hand_object_pose_tpu.ops import icp
    for p in range(P):
        idx, d2 = knn.nn(scene_c, ref_c[p])
        m = ref_c[p][idx]
        n = ref_n[p][idx]
        w = icp.correspondence_weights(
            d2, scene_n, n, scene_w, math.sqrt(maxd2), min_cos
        )
        r = jnp.sum(n * (scene_c - m), axis=-1)
        J = jnp.concatenate([jnp.cross(m, n), n], axis=-1)
        wJ = J * w[:, None]
        H_ref = jnp.einsum("ni,nj->ij", wJ, J,
                           precision=jax.lax.Precision.HIGHEST)
        g_ref = jnp.einsum("ni,n->i", wJ, r,
                           precision=jax.lax.Precision.HIGHEST)
        np.testing.assert_allclose(np.asarray(H[p]), np.asarray(H_ref),
                                   rtol=1e-4, atol=1e-6)
        np.testing.assert_allclose(np.asarray(g[p]), np.asarray(g_ref),
                                   rtol=1e-4, atol=1e-6)
        np.testing.assert_allclose(float(wsum[p]), float(jnp.sum(w)),
                                   rtol=1e-5)
        np.testing.assert_allclose(
            float(hits[p]),
            float(jnp.sum(scene_w * (d2 < tau2))), rtol=1e-5)
        np.testing.assert_allclose(float(wrr[p]), float(jnp.sum(w * r * r)),
                                   rtol=1e-4, atol=1e-8)


def test_icp_with_gn_fn():
    """Batched ICP through the fused GN path converges like the
    corr_fn path (same scene; fused runs 1 linearization per search)."""
    from icra20_hand_object_pose_tpu.ops import icp
    from icra20_hand_object_pose_tpu.utils import meshio, se3

    mesh = meshio.make_test_object("box")
    mpts, mnrm = mesh.sample_surface(128, seed=0)
    mpts, mnrm = jnp.asarray(mpts), jnp.asarray(mnrm)
    T_gt = se3.make_pose(jnp.eye(3), jnp.asarray([0.0, 0.0, 0.4]))
    scene = se3.transform_points(T_gt, mpts)
    snrm = se3.rotate_vectors(T_gt, mnrm)
    w = jnp.ones(scene.shape[0])
    keys = jax.random.split(jax.random.key(6), 4)
    poses0 = jax.vmap(lambda k: se3.perturb_pose(k, T_gt, 0.05, 0.008))(keys)
    import math
    gn = knn_pallas.make_gn_fn(
        maxd2=0.05 ** 2, min_cos=math.cos(math.radians(60.0)),
        tau2=0.03 ** 2, tile_s=128, tile_m=128, interpret=True,
    )
    refined, stats = icp.icp_batched(
        poses0, scene, snrm, w, mpts, mnrm,
        iters=10, max_corresp_dist=0.05, support_tau=0.03, gn_fn=gn)
    errs = jax.vmap(lambda T: se3.add_error(T, T_gt, mpts))(refined)
    assert float(jnp.max(errs)) < 0.002, np.asarray(errs)
    assert float(jnp.min(stats.support)) > 0.9   # converged: explained
