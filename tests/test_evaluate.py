"""Evaluation-module tests: mirrored observations and match metrics."""

import jax
import jax.numpy as jnp
import numpy as np

from gym_futbol_tpu import EnvParams, observe, reset
from gym_futbol_tpu.evaluate import evaluate, mirror_obs, random_team_policy


P = EnvParams(players_per_team=2)


class TestMirrorObs:
    def test_involution(self, key):
        """Mirroring twice is the identity."""
        state, obs = reset(key, P)
        m = mirror_obs(mirror_obs(obs, P), P)
        np.testing.assert_allclose(np.asarray(m), np.asarray(obs), atol=1e-6)

    def test_mirror_swaps_teams_and_x(self, key):
        state, obs = reset(key, P)
        m = mirror_obs(obs, P)
        n = P.n_bodies
        body = np.asarray(obs[: 4 * n]).reshape(n, 4)
        mbody = np.asarray(m[: 4 * n]).reshape(n, 4)
        # ball x mirrored about the (normalized) center
        assert np.isclose(mbody[0, 0], 1.0 - body[0, 0], atol=1e-6)
        # team 1's first player appears in team 0's slot, x mirrored
        assert np.isclose(mbody[1, 0], 1.0 - body[3, 0], atol=1e-6)
        assert np.isclose(mbody[1, 1], body[3, 1], atol=1e-6)

    def test_possession_flags_swapped(self, key):
        state, obs = reset(key, P)
        obs = obs.at[-2:].set(jnp.asarray([1.0, 0.0]))
        m = mirror_obs(obs, P)
        np.testing.assert_allclose(np.asarray(m[-2:]), [0.0, 1.0])


class TestEvaluate:
    def test_random_vs_random_metrics(self):
        res = evaluate(P, n_envs=32, n_steps=40, seed=0)
        assert res["goals"].shape == (2,)
        total = res["win_rate_a"] + res["win_rate_b"] + res["draw_rate"]
        assert np.isclose(total, 1.0, atol=1e-6)
        assert np.isfinite(res["mean_team0_reward"])

    def test_symmetric_matchup_is_fairish(self):
        """Random vs random over many envs: neither side should win
        overwhelmingly (mirror logic sanity, not a statistics test)."""
        res = evaluate(P, n_envs=256, n_steps=60, seed=1)
        assert abs(res["win_rate_a"] - res["win_rate_b"]) < 0.4
