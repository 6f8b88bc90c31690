"""Render-and-compare scorer tests, incl. finger-occlusion masking
(SURVEY.md §3 "Render-and-compare scorer"; BASELINE config 3 pieces)."""
import jax.numpy as jnp
import numpy as np

from icra20_hand_object_pose_tpu.ops import score

H, W = 32, 40


def _obs(depth_val=0.5):
    obs = np.full((H, W), np.nan, np.float32)
    obs[8:24, 10:30] = depth_val
    valid = np.isfinite(obs)
    return jnp.asarray(np.nan_to_num(obs)), jnp.asarray(valid)


def test_perfect_match_scores_one():
    obs, valid = _obs()
    rendered = jnp.where(valid, obs, jnp.inf)
    t = score.compare_depth(rendered, obs, valid)
    np.testing.assert_allclose(float(t.fitness), 1.0, atol=1e-6)
    assert float(t.coverage) > 0.99


def test_depth_offset_scores_lower():
    obs, valid = _obs()
    exact = jnp.where(valid, obs, jnp.inf)
    off = jnp.where(valid, obs + 0.005, jnp.inf)  # half tau behind
    t_exact = score.compare_depth(exact, obs, valid, depth_tau=0.01)
    t_off = score.compare_depth(off, obs, valid, depth_tau=0.01)
    assert float(t_off.fitness) < float(t_exact.fitness)
    np.testing.assert_allclose(float(t_off.fitness), 0.5, atol=1e-5)


def test_wrong_side_penalized_more_than_behind():
    obs, valid = _obs()
    front = jnp.where(valid, obs - 0.05, jnp.inf)   # floats in front: impossible
    behind = jnp.where(valid, obs + 0.05, jnp.inf)  # behind: merely unsupported
    t_front = score.compare_depth(front, obs, valid)
    t_behind = score.compare_depth(behind, obs, valid)
    assert float(t_front.fitness) < float(t_behind.fitness) < 0.01


def test_empty_render_is_worst():
    obs, valid = _obs()
    empty = jnp.full((H, W), jnp.inf)
    t = score.compare_depth(empty, obs, valid)
    assert float(t.fitness) <= -1.9


def test_hand_occlusion_excludes_pixels():
    obs, valid = _obs()
    # hypothesis renders object at 0.5 everywhere in the obs window BUT
    # observation in the left half is actually the hand at 0.45
    obs_np = np.asarray(obs).copy()
    obs_np[8:24, 10:20] = 0.45
    obs2 = jnp.asarray(obs_np)
    rendered = jnp.where(valid, 0.5, jnp.inf)
    hand = np.full((H, W), np.inf, np.float32)
    hand[8:24, 10:20] = 0.45
    t_no_hand = score.compare_depth(rendered, obs2, valid)
    t_hand = score.compare_depth(rendered, obs2, valid, jnp.asarray(hand))
    # without the hand mask the left half is "wrong side"-ish mismatch;
    # with the mask those pixels are excluded and fitness is perfect
    assert float(t_no_hand.fitness) < 0.6
    np.testing.assert_allclose(float(t_hand.fitness), 1.0, atol=1e-6)


def test_batched_particle_axis():
    obs, valid = _obs()
    r0 = jnp.where(valid, obs, jnp.inf)
    r1 = jnp.where(valid, obs + 0.02, jnp.inf)
    batch = jnp.stack([r0, r1])
    t = score.compare_depth(batch, obs, valid)
    assert t.fitness.shape == (2,)
    assert float(t.fitness[0]) > float(t.fitness[1])


# -- subpixel (edge-aware bilinear) observed-depth gather --------------------

def _plane_points(us, vs, depth_fn, fx=100.0, fy=100.0, cx=32.0, cy=24.0):
    """Camera-frame points projecting exactly to pixel coords (us, vs) with
    z on the observed surface; normals face the camera."""
    us = np.asarray(us, np.float32)
    vs = np.asarray(vs, np.float32)
    z = depth_fn(us, vs).astype(np.float32)
    x = (us - cx) / fx * z
    y = (vs - cy) / fy * z
    pts = np.stack([x, y, z], -1)
    nrm = np.tile(np.array([0.0, 0.0, -1.0], np.float32), (len(us), 1))
    return jnp.asarray(pts), jnp.asarray(nrm)


def _compare(pts, nrm, obs, valid, subpixel, tau=0.01, ghost_dilate=0):
    return score.compare_points(
        pts, nrm, jnp.asarray(obs), jnp.asarray(valid), None,
        fx=100.0, fy=100.0, cx=32.0, cy=24.0, height=48, width=64,
        depth_tau=tau, subpixel=subpixel, ghost_dilate=ghost_dilate,
    )


def test_subpixel_removes_quantization_error():
    """Slanted surface, samples at half-pixel offsets: nearest-gather sees
    slope/2 error per sample, bilinear reconstructs exactly (VERDICT r1:
    the ~z/f-per-pixel rounding was the measured accuracy floor)."""
    gu = 0.008  # 8mm of depth per pixel of slope
    uu, vv = np.meshgrid(np.arange(64, dtype=np.float32),
                         np.arange(48, dtype=np.float32))
    obs = (0.4 + gu * uu).astype(np.float32)
    valid = np.ones_like(obs, bool)
    depth_fn = lambda u, v: 0.4 + gu * u
    us = np.arange(10, 50, dtype=np.float32) + 0.5   # between pixel centers
    vs = np.full_like(us, 20.0)
    pts, nrm = _plane_points(us, vs, depth_fn)
    t_near = _compare(pts, nrm, obs, valid, subpixel=False)
    t_sub = _compare(pts, nrm, obs, valid, subpixel=True)
    n = len(us)
    assert float(t_sub.support) > 0.995 * n
    # nearest: |diff| = gu/2 = 4mm -> support 0.6/sample
    assert float(t_near.support) < 0.65 * n


def test_subpixel_does_not_blend_across_edges():
    """Depth discontinuity: naive bilinear would mix foreground with the
    surface behind it; the edge-aware window must fall back to the
    nearest pixel's depth."""
    obs = np.full((48, 64), 0.5, np.float32)
    obs[:, 32:] = 1.0                      # step edge at u=31.5
    valid = np.ones_like(obs, bool)
    us = np.array([31.3], np.float32)      # foreground side, near the edge
    vs = np.array([20.0], np.float32)
    pts, nrm = _plane_points(us, vs, lambda u, v: np.full_like(u, 0.5))
    t = _compare(pts, nrm, obs, valid, subpixel=True)
    assert float(t.support) > 0.999        # exact match, no smearing


def test_subpixel_invalid_neighbor_excluded():
    """An invalid neighbor pixel must not poison the interpolation; a
    sample whose NEAREST pixel is invalid must be invalid (ghost)."""
    obs = np.full((48, 64), 0.5, np.float32)
    valid = np.ones_like(obs, bool)
    valid[20, 33] = False
    # nearest = (32,20) valid, right neighbor invalid -> still matches
    pts, nrm = _plane_points(
        np.array([32.4], np.float32), np.array([20.0], np.float32),
        lambda u, v: np.full_like(u, 0.5),
    )
    t = _compare(pts, nrm, obs, valid, subpixel=True)
    assert float(t.support) > 0.999
    # nearest = (33,20) invalid -> ghost (ghost_dilate=0 strict semantics)
    pts2, nrm2 = _plane_points(
        np.array([32.6], np.float32), np.array([20.0], np.float32),
        lambda u, v: np.full_like(u, 0.5),
    )
    t2 = _compare(pts2, nrm2, obs, valid, subpixel=True)
    assert float(t2.counted) == 1.0 and float(t2.support) == 0.0


def test_ghost_dilation_tolerates_silhouette_band():
    """With ghost_dilate=1, a no-return projection adjacent to valid
    pixels is neutral (neither support nor penalty); one beyond the band
    is still a penalized ghost. This removes the systematic inward
    squeeze on exact poses whose boundary samples straddle the
    silhouette."""
    obs = np.zeros((48, 64), np.float32)
    valid = np.zeros_like(obs, bool)
    obs[:, :32] = 0.5
    valid[:, :32] = True                 # silhouette edge at u=31.5
    mk = lambda u: _plane_points(
        np.array([u], np.float32), np.array([20.0], np.float32),
        lambda uu, vv: np.full_like(uu, 0.5),
    )
    # 1 px outside the silhouette: neutral under dilation, ghost without
    pts, nrm = mk(32.4)
    t_dil = _compare(pts, nrm, obs, valid, subpixel=False, ghost_dilate=1)
    t_raw = _compare(pts, nrm, obs, valid, subpixel=False, ghost_dilate=0)
    assert float(t_dil.counted) == 0.0
    assert float(t_raw.counted) == 1.0 and float(t_raw.support) == 0.0
    # 3 px outside: ghost either way (drift into unobserved space pays)
    pts2, nrm2 = mk(34.6)
    t_far = _compare(pts2, nrm2, obs, valid, subpixel=False, ghost_dilate=1)
    assert float(t_far.counted) == 1.0 and float(t_far.support) == 0.0


def test_neutral_class_no_ghost_no_coverage_charge():
    """Segmentation-dropped pixels (encode_observed neutral=...) carry
    no ghost penalty: the grasped TRUE pose must not pay the fitness
    penalty for pixels the hand drop conservatively took away (the
    box-init t=17 failure class). A sample on a plain no-return pixel at
    the same distance from the silhouette stays a ghost. By default
    neutral samples stay in the coverage denominator (exempting them
    measurably pulled noisy tracking toward the hand region); with
    neutral_cov_exempt=True (init-mode scoring) they leave it — see the
    comment in compare_points."""
    obs = np.zeros((48, 64), np.float32)
    valid = np.zeros_like(obs, bool)
    obs[:, :32] = 0.5
    valid[:, :32] = True
    neutral = np.zeros_like(valid)
    neutral[:, 40:48] = True             # e.g. hand-dropped strip
    # two matching samples on the surface + one sample deep in the strip
    us = np.array([10.0, 20.0, 44.0], np.float32)
    vs = np.full(3, 20.0, np.float32)
    pts, nrm = _plane_points(us, vs, lambda uu, vv: np.full_like(uu, 0.5))
    enc_n = score.encode_observed(
        jnp.asarray(obs), jnp.asarray(valid), 1, neutral=jnp.asarray(neutral))
    t_n = score.compare_points(
        pts, nrm, jnp.asarray(obs), jnp.asarray(valid), None,
        fx=100.0, fy=100.0, cx=32.0, cy=24.0, height=48, width=64,
        depth_tau=0.01, subpixel=False, observed_enc=enc_n,
    )
    enc_g = score.encode_observed(jnp.asarray(obs), jnp.asarray(valid), 1)
    t_g = score.compare_points(
        pts, nrm, jnp.asarray(obs), jnp.asarray(valid), None,
        fx=100.0, fy=100.0, cx=32.0, cy=24.0, height=48, width=64,
        depth_tau=0.01, subpixel=False, observed_enc=enc_g,
    )
    # without the neutral class: strip sample is a counted ghost (pays
    # invalid_penalty in fitness)
    assert float(t_g.counted) == 3.0 and float(t_g.fitness) < 0.9
    # with it: the strip sample is no-evidence for fitness (full score
    # from the 2 matches) but still in the coverage denominator
    assert float(t_n.counted) == 2.0
    np.testing.assert_allclose(float(t_n.fitness), 1.0, atol=1e-6)
    np.testing.assert_allclose(float(t_n.coverage), 2.0 / 3.0, atol=1e-6)
    np.testing.assert_allclose(float(t_g.coverage), 2.0 / 3.0, atol=1e-6)
    # init-mode scoring additionally exempts the neutral sample from the
    # coverage denominator (neutral_cov_exempt=True)
    t_e = score.compare_points(
        pts, nrm, jnp.asarray(obs), jnp.asarray(valid), None,
        fx=100.0, fy=100.0, cx=32.0, cy=24.0, height=48, width=64,
        depth_tau=0.01, subpixel=False, observed_enc=enc_n,
        neutral_cov_exempt=True,
    )
    np.testing.assert_allclose(float(t_e.coverage), 1.0, atol=1e-6)
    np.testing.assert_allclose(float(t_e.fitness), 1.0, atol=1e-6)
