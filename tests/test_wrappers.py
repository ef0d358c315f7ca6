"""Tests for wrappers (episode stats, obs normalization) and evaluation."""

import jax
import jax.numpy as jnp
import numpy as np

from gym_futbol_tpu import EnvParams
from gym_futbol_tpu.evaluate import evaluate, joint_policy, mirror_obs, random_team_policy
from gym_futbol_tpu.vector import reset_batch
from gym_futbol_tpu.wrappers import (
    EpisodeStats,
    RunningNorm,
    step_normalized,
    step_with_stats,
)


P = EnvParams(players_per_team=1, max_steps=5)


class TestEpisodeStats:
    def test_episode_accounting(self, key):
        n = 4
        state, _ = reset_batch(key, P, n)
        stats = EpisodeStats.init(n)
        a = jnp.zeros((n, P.n_players, 2), jnp.int32)
        for t in range(5):
            state, stats, out = step_with_stats(state, stats, a, P)
        # all episodes finished exactly once at t=5
        assert np.asarray(stats.episodes).tolist() == [1] * n
        assert np.asarray(stats.last_length).tolist() == [5] * n
        # accumulators restarted
        assert np.asarray(stats.acc_length).tolist() == [0] * n

    def test_running_between_episodes(self, key):
        n = 2
        state, _ = reset_batch(key, P, n)
        stats = EpisodeStats.init(n)
        a = jnp.zeros((n, P.n_players, 2), jnp.int32)
        for t in range(3):
            state, stats, out = step_with_stats(state, stats, a, P)
        assert np.asarray(stats.acc_length).tolist() == [3, 3]
        assert np.asarray(stats.episodes).tolist() == [0, 0]


class TestRunningNorm:
    def test_matches_numpy_stats(self):
        rng = np.random.RandomState(0)
        data = rng.randn(10, 64, 6).astype(np.float32) * 3 + 1.5
        norm = RunningNorm.init(6)
        for batch in data:
            norm = norm.update(jnp.asarray(batch))
        flat = data.reshape(-1, 6)
        np.testing.assert_allclose(np.asarray(norm.mean), flat.mean(0), rtol=1e-3)
        np.testing.assert_allclose(np.asarray(norm.var), flat.var(0), rtol=1e-2)

    def test_step_normalized_runs(self, key):
        n = 8
        state, obs = reset_batch(key, P, n)
        norm = RunningNorm.init(obs.shape[-1])
        a = jnp.zeros((n, P.n_players, 2), jnp.int32)
        state, norm, out = step_normalized(state, norm, a, P)
        assert np.isfinite(np.asarray(out.obs)).all()
        assert float(norm.count) > 1.0


class TestEvaluate:
    def test_mirror_obs_involution(self, key):
        p = EnvParams(players_per_team=2)
        obs = jax.random.uniform(key, (7, 4 * p.n_bodies + 2))
        twice = mirror_obs(mirror_obs(obs, p), p)
        np.testing.assert_allclose(np.asarray(twice), np.asarray(obs), rtol=1e-6)

    def test_random_vs_random_roughly_fair(self):
        p = EnvParams(players_per_team=1, max_steps=60)
        res = evaluate(p, n_envs=64, n_steps=60, seed=3)
        # symmetric matchup: neither side dominates
        assert abs(float(res["win_rate_a"]) - float(res["win_rate_b"])) < 0.35
        assert res["goals"].shape == (2,)

    def test_joint_policy_shapes(self, key):
        p = EnvParams(players_per_team=2)
        pol = joint_policy(p, random_team_policy(p), random_team_policy(p))
        obs = jnp.zeros((5, 4 * p.n_bodies + 2))
        acts = pol(key, obs)
        assert acts.shape == (5, p.n_players, 2)
        assert (np.asarray(acts) >= 0).all() and (np.asarray(acts) < 5).all()
