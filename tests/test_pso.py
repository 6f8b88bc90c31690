"""PSO swarm optimizer tests (SURVEY.md §5 item 4, BASELINE config 3).

Synthetic setup: object-only scene rendered from a known GT pose; the
swarm must recover it from a perturbed start. Small sizes for CPU.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from icra20_hand_object_pose_tpu.ops import pso, render
from icra20_hand_object_pose_tpu.utils import meshio, se3
from icra20_hand_object_pose_tpu.utils.config import IcpConfig, PsoConfig, ScoreConfig

CAM = dict(fx=80.0, fy=80.0, cx=40.0, cy=30.0, height=60, width=80)


def make_problem(key, rot_deg=12.0, trans=0.02):
    mesh = meshio.make_test_object("box")
    mpts, mnrm = mesh.sample_surface(256, seed=0)
    mpts = jnp.asarray(mpts)
    mnrm = jnp.asarray(mnrm)
    rpts, rnrm = mesh.sample_surface(512, seed=1)
    rpts = jnp.asarray(rpts)
    rnrm = jnp.asarray(rnrm)
    rw = jnp.ones(512)

    T_gt = jnp.asarray(se3.make_pose(jnp.eye(3), jnp.asarray([0.0, 0.0, 0.4])))
    # observed scene: GT-posed model points; observed depth = splat of them
    scene_pts = se3.transform_points(T_gt, rpts)
    obs = render.splat_depth(scene_pts, rw, radius=1, **CAM)
    obs_valid = jnp.isfinite(obs)
    obs = jnp.where(obs_valid, obs, 0.0)
    hand_depth = jnp.full((CAM["height"], CAM["width"]), jnp.inf)

    k1, k2 = jax.random.split(key)
    w = jax.random.normal(k1, (3,))
    w = w / jnp.linalg.norm(w) * jnp.radians(rot_deg)
    v = jax.random.normal(k2, (3,))
    v = v / jnp.linalg.norm(v) * trans
    T0 = se3.apply_twist_about(jnp.concatenate([w, v]), T_gt, T_gt[:3, 3])

    scene_icp = se3.transform_points(T_gt, mpts)
    scene_nrm = se3.rotate_vectors(T_gt, mnrm)
    return dict(
        mesh=mesh, model_pts=mpts, model_normals=mnrm,
        render_pts=rpts, render_normals=rnrm, render_w=rw,
        T_gt=T_gt, T0=T0,
        scene_pts=scene_icp, scene_normals=scene_nrm,
        scene_weights=jnp.ones(scene_icp.shape[0]),
        obs=obs, obs_valid=obs_valid, hand_depth=hand_depth,
    )


def run_pso(p, key, particles=16, iters=4, **over):
    poses0 = jax.vmap(
        lambda k: se3.perturb_pose(k, p["T0"], 0.05, 0.01)
    )(jax.random.split(key, particles))
    cfgs = dict(
        pso_cfg=PsoConfig(
            particles=particles, iters=iters, rot_sigma=0.08, trans_sigma=0.01,
            sigma_decay=0.7, icp_every=1, icp_iters_inner=4, elite_frac=0.25,
        ),
        icp_cfg=IcpConfig(iters=10, max_corresp_dist=0.05),
        score_cfg=ScoreConfig(),
    )
    cfgs.update(over)
    return pso.pso(
        key, poses0,
        p["scene_pts"], p["scene_normals"], p["scene_weights"],
        p["model_pts"], p["model_normals"],
        p["render_pts"], p["render_normals"], p["render_w"],
        p["obs"], p["obs_valid"], p["hand_depth"],
        splat_radius=1, **CAM, **cfgs,
    )


def test_pso_recovers_pose():
    key = jax.random.key(0)
    p = make_problem(key)
    res = jax.jit(lambda k: run_pso(p, k))(jax.random.key(1))
    add = se3.add_error(res.best_pose, p["T_gt"], p["model_pts"])
    assert float(add) < 0.005, f"ADD {float(add)*1000:.2f}mm"
    assert float(res.best_fitness) > 0.3


def test_pso_fitness_trace_monotone():
    """Global best fitness must never decrease across iterations."""
    p = make_problem(jax.random.key(2))
    res = run_pso(p, jax.random.key(3), particles=8, iters=5)
    tr = np.asarray(res.fitness_trace)
    assert np.all(np.diff(tr) >= -1e-6), tr


def test_pso_best_at_gt_survives():
    """If a particle starts exactly at GT, the result cannot be worse."""
    p = make_problem(jax.random.key(4))
    particles = 8
    poses0 = jnp.broadcast_to(p["T0"], (particles, 4, 4)).at[3].set(p["T_gt"])
    res = pso.pso(
        jax.random.key(5), poses0,
        p["scene_pts"], p["scene_normals"], p["scene_weights"],
        p["model_pts"], p["model_normals"],
        p["render_pts"], p["render_normals"], p["render_w"],
        p["obs"], p["obs_valid"], p["hand_depth"],
        splat_radius=1, **CAM,
        pso_cfg=PsoConfig(particles=particles, iters=3, icp_every=1,
                          icp_iters_inner=3, elite_frac=0.25),
        icp_cfg=IcpConfig(iters=5),
        score_cfg=ScoreConfig(),
    )
    add = se3.add_error(res.best_pose, p["T_gt"], p["model_pts"])
    assert float(add) < 0.003


def test_pso_no_icp_still_improves():
    """Pure render-and-compare annealing (icp_every=0) should still reduce
    error vs the initial hypothesis."""
    p = make_problem(jax.random.key(6), rot_deg=8.0, trans=0.015)
    res = run_pso(
        p, jax.random.key(7), particles=32, iters=6,
        pso_cfg=PsoConfig(particles=32, iters=6, rot_sigma=0.08,
                          trans_sigma=0.01, icp_every=0, elite_frac=0.25),
    )
    add0 = se3.add_error(p["T0"], p["T_gt"], p["model_pts"])
    add1 = se3.add_error(res.best_pose, p["T_gt"], p["model_pts"])
    assert float(add1) < float(add0)


def test_slide_proposals_escape_axial_fixed_point():
    """PsoConfig.slide_proposals: a pose slid along the box's long axis is
    an exact point-to-plane fixed point once the end-face evidence is
    removed from the ICP cloud (every side-surface residual is zero under
    an axial slide), so neither the in-scan ICP nor the final polish can
    recover it — but the axial-slide candidate family probes the true
    basin directly and the fine-tier argmax (which still sees the full
    observed image, where the slid render misses the observed end) picks
    it up. With slide_proposals=0 the run must stay stuck."""
    mesh = meshio.make_test_object("box")          # extents (.05,.05,.12)
    mpts, mnrm = mesh.sample_surface(512, seed=0)
    mpts, mnrm = jnp.asarray(mpts), jnp.asarray(mnrm)
    rpts, rnrm = mesh.sample_surface(512, seed=1)
    rpts, rnrm = jnp.asarray(rpts), jnp.asarray(rnrm)
    rw = jnp.ones(512)
    T_gt = jnp.asarray(se3.make_pose(jnp.eye(3), jnp.asarray([0.0, 0.0, 0.4])))
    scene_pts = se3.transform_points(T_gt, mpts)
    scene_nrm = se3.rotate_vectors(T_gt, mnrm)
    # ICP sees only the side surfaces (axial slide = zero p2pl residual);
    # the observed IMAGE still contains the full box including its ends
    w_icp = (jnp.abs(mpts[:, 2]) < 0.045).astype(jnp.float32)
    obs = render.splat_depth(se3.transform_points(T_gt, rpts), rw,
                             radius=1, **CAM)
    obs_valid = jnp.isfinite(obs)
    obs = jnp.where(obs_valid, obs, 0.0)
    hand_depth = jnp.full((CAM["height"], CAM["width"]), jnp.inf)

    slide = 0.04                                   # meters, along model z
    T0 = T_gt.at[:3, 3].add(T_gt[:3, :3] @ jnp.asarray([0.0, 0.0, slide]))
    poses0 = jnp.broadcast_to(T0, (4, 4, 4))

    def run(n_slide):
        res = pso.pso(
            jax.random.key(8), poses0,
            scene_pts, scene_nrm, w_icp,
            mpts, mnrm, rpts, rnrm, rw,
            obs, obs_valid, hand_depth,
            splat_radius=1, **CAM,
            pso_cfg=PsoConfig(
                particles=4, iters=1, rot_sigma=1e-4, trans_sigma=1e-5,
                icp_every=0, elite_frac=0.25, polish_top_k=2,
                finish_iters=0, slide_proposals=n_slide,
            ),
            icp_cfg=IcpConfig(iters=6, max_corresp_dist=0.02),
            score_cfg=ScoreConfig(),
        )
        return float(se3.add_error(res.best_pose, T_gt, mpts))

    add_stuck = run(0)
    add_slide = run(8)
    assert add_stuck > 0.025, f"baseline unexpectedly recovered: {add_stuck}"
    assert add_slide < 0.010, f"slide proposals failed: {add_slide}"


def test_diverse_hypotheses_picks_distinct_basins():
    from icra20_hand_object_pose_tpu.ops.pso import diverse_hypotheses
    from icra20_hand_object_pose_tpu.utils import se3

    # two clusters of candidates: near identity, and rotated 90deg + 10cm
    far = np.asarray(se3.se3_exp(jnp.asarray([1.57, 0, 0, 0.1, 0, 0], jnp.float32)))
    cands = np.tile(np.eye(4, dtype=np.float32), (6, 1, 1))
    cands[3:] = far
    # jitter within each cluster (strictly below the 15deg/2cm radii)
    for i, eps in enumerate([0.0, 0.005, 0.01, 0.0, 0.005, 0.01]):
        cands[i][:3, 3] += eps
    fit = jnp.asarray([0.9, 0.8, 0.7, 0.85, 0.6, 0.5])
    p, f = diverse_hypotheses(jnp.asarray(cands), fit, 3)
    # pick 1: best overall (identity cluster); pick 2: best of far cluster;
    # pick 3: exhausted -> -inf
    assert np.allclose(np.asarray(p[0]), cands[0], atol=1e-6)
    assert np.allclose(np.asarray(p[1]), cands[3], atol=1e-6)
    assert float(f[0]) == pytest.approx(0.9)
    assert float(f[1]) == pytest.approx(0.85)
    assert not np.isfinite(float(f[2]))


def test_diverse_hypotheses_first_pose_forced():
    from icra20_hand_object_pose_tpu.ops.pso import diverse_hypotheses

    cands = jnp.tile(jnp.eye(4), (4, 1, 1))
    fit = jnp.asarray([0.5, 0.4, 0.3, 0.2])
    forced = jnp.eye(4).at[2, 3].set(0.5)   # far from all candidates
    p, f = diverse_hypotheses(cands, fit, 2, first_pose=forced,
                              first_fitness=jnp.asarray(0.99))
    assert np.allclose(np.asarray(p[0]), np.asarray(forced))
    assert float(f[0]) == pytest.approx(0.99)
    assert np.allclose(np.asarray(p[1]), np.eye(4))  # best candidate next


def test_continuity_select_prefers_prior_branch_on_tie():
    """PsoConfig.tie_break_eps: among near-tie fine-tier candidates, the
    one closest to the prior pose wins — an exact-symmetry twin (same
    fitness up to sampling noise) must not displace the incumbent branch."""
    from icra20_hand_object_pose_tpu.ops.pso import continuity_select
    from icra20_hand_object_pose_tpu.utils import se3

    pts = np.random.default_rng(0).normal(size=(256, 3)).astype(np.float32)
    prior = np.eye(4, dtype=np.float32)
    twin = np.asarray(se3.se3_exp(          # 90deg z-twin of a square prism
        jnp.asarray([0, 0, np.pi / 2, 0, 0, 0], jnp.float32)))
    near = prior.copy()
    near[0, 3] += 0.0004                    # same basin, 0.4 mm off
    cands = jnp.asarray(np.stack([twin, near, prior]))
    # twin wins the raw argmax by a hair (sampling noise scale)
    fit = jnp.asarray([1.402, 1.398, 1.400])
    bi = continuity_select(cands, fit, jnp.asarray(prior),
                           jnp.asarray(pts), eps=0.01)
    assert int(bi) == 2                      # prior branch, best-of-branch

    # a genuinely better basin (beyond the tie window) wins regardless
    fit2 = jnp.asarray([1.60, 1.398, 1.400])
    bi2 = continuity_select(cands, fit2, jnp.asarray(prior),
                            jnp.asarray(pts), eps=0.01)
    assert int(bi2) == 0


def test_snap_to_branch_reports_prior_consistent_twin():
    """ops/pso.snap_to_branch: an exact-symmetry twin of the best pose is
    reported on the PRIOR's branch (pose @ S*), preserving the residual
    error exactly — the depth image of pose and pose @ S is identical, so
    the branch choice is convention and must be the temporally-stable one."""
    from icra20_hand_object_pose_tpu.models import ObjectModel
    from icra20_hand_object_pose_tpu.ops.pso import snap_to_branch
    from icra20_hand_object_pose_tpu.utils import meshio, se3

    obj = ObjectModel(meshio.make_test_object("box"),
                      model_points=256, render_points=512)
    assert obj.symmetries.shape == (8, 4, 4)          # square-prism group
    prior = jnp.eye(4)
    # estimator landed on the 90deg z-twin, with a small genuine error
    err = se3.se3_exp(jnp.asarray([0.01, 0, 0, 0.001, 0, 0], jnp.float32))
    twin = se3.compose(err, se3.se3_exp(
        jnp.asarray([0, 0, np.pi / 2, 0, 0, 0], jnp.float32)))
    snapped = np.asarray(snap_to_branch(twin, prior, obj.symmetries,
                                        obj.model_pts))
    # back on the prior branch: rotation error vs prior ~ the genuine
    # error (0.57deg), not 90deg
    ang = np.degrees(np.arccos(np.clip(
        (np.trace(snapped[:3, :3]) - 1) / 2, -1, 1)))
    assert ang < 1.0, ang
    # the snap composes an EXACT group member: snapped == twin @ S for
    # some S (same physical pose; sampled ADD-S would only bound this at
    # its ~half-sample-spacing floor)
    assert any(
        np.allclose(snapped, np.asarray(twin) @ np.asarray(S), atol=1e-5)
        for S in obj.symmetries
    )

    # trivial group (asym): ObjectModel carries identity alone and the
    # estimator skips the snap entirely (static shape 1)
    obj2 = ObjectModel(meshio.make_test_object("asym"),
                       model_points=64, render_points=64)
    assert obj2.symmetries.shape == (1, 4, 4)
    assert np.allclose(np.asarray(obj2.symmetries[0]), np.eye(4))
