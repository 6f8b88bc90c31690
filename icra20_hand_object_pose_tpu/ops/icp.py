"""Point-to-plane ICP as a batched Gauss-Newton tensor program.

TPU-native rebuild of the reference's per-hypothesis refinement
(SURVEY.md §3 "Point-to-plane ICP": ~30 Gauss-Newton iterations of
min_T sum_i ((s_i - T m_j(i)) . n_j(i))^2 with PCL KD-tree
correspondences, serial C++ per particle). Redesign:

  - correspondences: dense MXU distance matrix + argmin (ops/knn.py),
    optionally the fused Pallas kernel (ops/knn_pallas.py);
  - the 6x6 normal equations are built with one einsum over points;
  - iterations are a lax.scan with a FIXED trip count — convergence is
    handled by freezing (converged hypotheses take zero-size steps), so
    shapes stay static under jit (SURVEY.md §8 hard part 5);
  - the particle axis is a vmap: 512 hypotheses refine as one device
    program instead of 512 serial C++ loops (BASELINE.json north star).

Direction convention: `pose` maps MODEL frame -> CAMERA frame. Scene
points are fixed observations; each ICP iteration matches scene points
to the posed model cloud and left-multiplies the pose with exp(xi).
"""
from __future__ import annotations

import math
from functools import partial
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from ..utils import se3
from . import knn

_PREC = jax.lax.Precision.HIGHEST


class IcpStats(NamedTuple):
    rmse: jax.Array        # weighted point-to-plane RMSE of final iterate
    inliers: jax.Array     # sum of correspondence weights
    converged: jax.Array   # bool: step norm below threshold at exit


def correspondence_weights(
    d2: jax.Array,
    scene_normals: jax.Array,
    model_normals_cam: jax.Array,
    scene_weights: jax.Array,
    max_corresp_dist: float,
    min_normal_cos: float,
) -> jax.Array:
    """Gate correspondences: distance, normal compatibility, padding.

    Mirrors the reference's correspondence rejection (max distance and
    normal-angle gates around its KD-tree search). Returns [Ns] weights
    in {0, 1} * scene_weights.
    """
    w = scene_weights
    w = w * (d2 < max_corresp_dist * max_corresp_dist)
    ncos = jnp.sum(scene_normals * model_normals_cam, axis=-1)
    # scene normals can be zero (padding); only gate where both normals exist
    have_n = (jnp.sum(scene_normals * scene_normals, -1) > 0.5) & (
        jnp.sum(model_normals_cam * model_normals_cam, -1) > 0.5
    )
    w = w * jnp.where(have_n, (ncos > min_normal_cos).astype(w.dtype), 1.0)
    return w


def solve_gn_step(
    scene_pts: jax.Array,     # [Ns,3]
    matched_pts: jax.Array,   # [Ns,3] posed model points matched to scene
    normals: jax.Array,       # [Ns,3] matched model normals in camera frame
    weights: jax.Array,       # [Ns]
    damping: float,
) -> tuple[jax.Array, jax.Array]:
    """One damped Gauss-Newton step of point-to-plane alignment.

    Linearizes r_i(xi) = n_i . (s_i - exp(xi) p_i) around xi=0:
    J_i = -[ (p_i x n_i), n_i ], so  (J^T W J + lam I) xi = J^T W r with
    J^T W r = sum w_i r_i [p_i x n_i; n_i]. Returns (xi [6], rmse).
    """
    r = jnp.sum(normals * (scene_pts - matched_pts), axis=-1)   # [Ns]
    pxn = jnp.cross(matched_pts, normals)                        # [Ns,3]
    J = jnp.concatenate([pxn, normals], axis=-1)                 # [Ns,6]
    wJ = J * weights[:, None]
    H = jnp.matmul(wJ.T, J, precision=_PREC)                     # [6,6]
    g = jnp.matmul(wJ.T, r[:, None], precision=_PREC)[:, 0]      # [6]
    # Scale-aware Levenberg damping keeps the solve well-posed when
    # correspondences are degenerate (few inliers, flat geometry).
    lam = damping * (jnp.trace(H) / 6.0 + 1e-12)
    xi = jnp.linalg.solve(H + lam * jnp.eye(6, dtype=H.dtype), g)
    wsum = jnp.maximum(jnp.sum(weights), 1e-9)
    rmse = jnp.sqrt(jnp.sum(weights * r * r) / wsum)
    # With zero inliers the system is pure damping and xi ~ g/lam garbage:
    # freeze instead.
    xi = jnp.where(jnp.sum(weights) > 6.0, xi, 0.0)
    return xi, rmse


def icp(
    pose0: jax.Array,          # [4,4] model->camera initial pose
    scene_pts: jax.Array,      # [Ns,3]
    scene_normals: jax.Array,  # [Ns,3] (zeros allowed)
    scene_weights: jax.Array,  # [Ns]
    model_pts: jax.Array,      # [Nm,3] model frame
    model_normals: jax.Array,  # [Nm,3] model frame
    *,
    iters: int = 30,
    max_corresp_dist: float = 0.02,
    normal_angle_max_deg: float = 60.0,
    damping: float = 1e-6,
    step_scale: float = 1.0,
    converge_tol: float = 1e-6,
    nn_fn: Callable | None = None,
) -> tuple[jax.Array, IcpStats]:
    """Point-to-plane ICP with fixed iteration count (jit/vmap/scan safe).

    nn_fn(query, ref) -> (idx, d2) overrides the correspondence search
    (plug in the Pallas kernel); defaults to the dense jnp path.
    """
    search = nn_fn if nn_fn is not None else knn.nn
    min_cos = math.cos(math.radians(normal_angle_max_deg))
    # Anchor the GN solve at the weighted scene centroid: rotations about
    # the camera origin are mostly translations for objects ~0.5m out,
    # which wrecks both the 6x6 conditioning and the linearization.
    wsum = jnp.maximum(jnp.sum(scene_weights), 1e-9)
    anchor = jnp.sum(scene_pts * scene_weights[:, None], axis=0) / wsum

    def body(carry, _):
        pose, frozen = carry
        posed = se3.transform_points(pose, model_pts)            # [Nm,3]
        idx, d2 = search(scene_pts, posed)
        matched = posed[idx]
        mnorm = se3.rotate_vectors(pose, model_normals)[idx]
        w = correspondence_weights(
            d2, scene_normals, mnorm, scene_weights, max_corresp_dist, min_cos
        )
        xi, rmse = solve_gn_step(
            scene_pts - anchor, matched - anchor, mnorm, w, damping
        )
        xi = xi * step_scale
        step = jnp.sum(xi * xi)
        new_frozen = frozen | (step < converge_tol * converge_tol)
        xi = jnp.where(frozen, 0.0, xi)
        pose = se3.apply_twist_about(xi, pose, anchor)
        return (pose, new_frozen), (rmse, jnp.sum(w))

    (pose, frozen), (rmses, inliers) = jax.lax.scan(
        body, (pose0, jnp.asarray(False)), None, length=iters
    )
    stats = IcpStats(rmse=rmses[-1], inliers=inliers[-1], converged=frozen)
    return pose, stats


def icp_batched(
    poses0: jax.Array,  # [P,4,4]
    scene_pts: jax.Array,
    scene_normals: jax.Array,
    scene_weights: jax.Array,
    model_pts: jax.Array,
    model_normals: jax.Array,
    **kwargs,
) -> tuple[jax.Array, IcpStats]:
    """vmap of `icp` over the particle axis — the BASELINE.json config-2
    "batched 64-particle refine" path. One device program for all P."""
    f = partial(
        icp,
        scene_pts=scene_pts,
        scene_normals=scene_normals,
        scene_weights=scene_weights,
        model_pts=model_pts,
        model_normals=model_normals,
        **kwargs,
    )
    return jax.vmap(lambda T: f(T))(poses0)
