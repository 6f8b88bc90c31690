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
