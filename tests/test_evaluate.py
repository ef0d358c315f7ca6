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
        ppt = P.players_per_team
        # obs layout: ALL positions first ([x,y] pairs), then velocities
        pos = np.asarray(obs[: 2 * n]).reshape(n, 2)
        mpos = np.asarray(m[: 2 * n]).reshape(n, 2)
        vel = np.asarray(obs[2 * n : 4 * n]).reshape(n, 2)
        mvel = np.asarray(m[2 * n : 4 * n]).reshape(n, 2)
        # ball x mirrored about the (normalized) center, y kept
        assert np.isclose(mpos[0, 0], 1.0 - pos[0, 0], atol=1e-6)
        assert np.isclose(mpos[0, 1], pos[0, 1], atol=1e-6)
        # team 1's first player appears in team 0's slot, x mirrored
        assert np.isclose(mpos[1, 0], 1.0 - pos[1 + ppt, 0], atol=1e-6)
        assert np.isclose(mpos[1, 1], pos[1 + ppt, 1], atol=1e-6)
        # velocities: vx negated, vy kept, same reorder
        assert np.isclose(mvel[1, 0], -vel[1 + ppt, 0], atol=1e-6)
        assert np.isclose(mvel[1, 1], vel[1 + ppt, 1], atol=1e-6)

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


class TestMirrorSemantics:
    def test_mirror_obs_equals_obs_of_mirrored_world(self, key):
        """mirror_obs(observe(s)) == observe(mirror_world(s)): the mirrored
        observation must equal the observation of the physically mirrored
        state (x -> width-x, vx -> -vx, team bodies swapped, possession
        flag side swapped). Catches layout misinterpretations that the
        involution property cannot (a wrong-element double flip still
        cancels)."""
        import jax.numpy as jnp
        import numpy as np

        from gym_futbol_tpu import EnvParams, env as env_core
        from gym_futbol_tpu.evaluate import mirror_obs

        params = EnvParams(players_per_team=2)
        state, obs = env_core.reset(key, params)
        # give everything a distinct velocity so errors can't hide
        state = state.replace(
            vel=jnp.arange(state.vel.size, dtype=jnp.float32).reshape(
                state.vel.shape
            ),
            possession=jnp.asarray(2, jnp.int32),  # team-0 player owns
        )
        obs = env_core.observe(state, params)

        ppt = params.players_per_team
        order = [0] + list(range(1 + ppt, 1 + 2 * ppt)) + list(
            range(1, 1 + ppt)
        )
        m_pos = state.pos[jnp.asarray(order)]
        m_pos = m_pos.at[:, 0].set(params.width - m_pos[:, 0])
        m_vel = state.vel[jnp.asarray(order)]
        m_vel = m_vel.at[:, 0].set(-m_vel[:, 0])
        mirrored_state = state.replace(
            pos=m_pos, vel=m_vel,
            possession=jnp.asarray(2 + ppt, jnp.int32),  # same player, team 1
        )
        expected = env_core.observe(mirrored_state, params)
        got = mirror_obs(obs, params)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(expected), rtol=1e-6, atol=1e-6
        )
