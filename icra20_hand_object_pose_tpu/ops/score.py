"""Render-and-compare hypothesis scoring with finger-occlusion masking.

TPU-native rebuild of the reference's per-particle scoring (SURVEY.md §3
"Render-and-compare scorer": rendered vs observed depth residual,
wrong-side penalties, finger-occlusion masking so points hidden behind
fingers are not penalized). Here the whole thing is an elementwise
tensor program over [P,H,W] — all P particles score in one fused pass
(BASELINE.json north star).

Fitness is HIGHER-better in [~ -wrong_side_penalty, 1]:

  per rendered-object pixel (object hypothesis depth d_r finite):
    - hand-occluded (hand depth < d_r - margin): EXCLUDED — the finger
      hides the object there; no evidence either way.
    - observed valid, |d_r - d_obs| < tau: support  1 - |diff|/tau.
    - observed valid, d_r < d_obs - tau: the hypothesis floats in front
      of a measured surface — physically impossible (the camera would
      have seen it) -> wrong-side penalty.
    - observed valid, d_r > d_obs + tau: hypothesis behind an observed
      surface that segmentation did not assign to the hand: counted,
      no support.
    - observed invalid (no depth return): GHOST pixel — the hypothesis
      renders where the camera measured nothing. For a depth camera,
      no-return over the working range is (weak) negative evidence, so
      ghosts enter the denominator with a small penalty. Without this a
      pose drifting into unobserved space sheds all its evidence pixels
      and scores near-perfect on the few that remain (observed failure
      mode: 71mm-wrong pose, fitness 0.99, coverage 0.007).

  fitness = (sum support - wrong_side_penalty * n_wrong
             - invalid_penalty * n_ghost) / n_counted
  coverage = n_support / n_object_pixels_observed  (how much of the
  observed object cloud the hypothesis explains; used by the tracking
  watchdog, BASELINE config 4).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class ScoreTerms(NamedTuple):
    fitness: jax.Array    # [...,] higher better
    coverage: jax.Array   # [...,] in [0,1]
    support: jax.Array    # [...,] sum of per-pixel support
    counted: jax.Array    # [...,] pixels with evidence


def compare_depth(
    rendered: jax.Array,    # [...,H,W] object hypothesis depth (+inf empty)
    observed: jax.Array,    # [H,W] observed depth (0 invalid)
    observed_valid: jax.Array,  # [H,W] bool
    hand_depth: jax.Array | None = None,  # [H,W] (+inf none)
    *,
    depth_tau: float = 0.01,
    wrong_side_penalty: float = 2.0,
    occlusion_margin: float = 0.005,
    invalid_penalty: float = 0.3,
) -> ScoreTerms:
    """Score rendered depth(s) against one observed frame. Broadcasts over
    leading particle axes of `rendered`."""
    r_valid = jnp.isfinite(rendered)
    if hand_depth is not None:
        occluded = hand_depth[None] < (rendered - occlusion_margin) if rendered.ndim == 3 else (
            hand_depth < rendered - occlusion_margin
        )
        visible = r_valid & (~occluded)
    else:
        visible = r_valid

    obs = jnp.where(observed_valid, observed, jnp.inf)
    diff = rendered - obs                         # broadcast [...,H,W]
    absdiff = jnp.abs(diff)

    counted_px = visible & observed_valid
    match = counted_px & (absdiff < depth_tau)
    wrong = counted_px & (diff < -depth_tau)      # floats in front of evidence
    ghost = visible & (~observed_valid)           # renders over no-return

    support_px = jnp.where(match, 1.0 - absdiff / depth_tau, 0.0)
    axes = (-1, -2)
    support = jnp.sum(support_px, axis=axes)
    n_wrong = jnp.sum(wrong.astype(rendered.dtype), axis=axes)
    n_ghost = jnp.sum(ghost.astype(rendered.dtype), axis=axes)
    n_counted = jnp.sum(counted_px.astype(rendered.dtype), axis=axes) + n_ghost

    fitness = (
        support - wrong_side_penalty * n_wrong - invalid_penalty * n_ghost
    ) / jnp.maximum(n_counted, 1.0)
    # padding/degenerate renders (nothing visible) must lose to anything real
    fitness = jnp.where(n_counted > 0, fitness, -wrong_side_penalty)

    n_obs = jnp.maximum(jnp.sum(observed_valid.astype(rendered.dtype)), 1.0)
    coverage = jnp.sum(match.astype(rendered.dtype), axis=axes) / n_obs
    return ScoreTerms(fitness=fitness, coverage=coverage, support=support, counted=n_counted)
