"""End-to-end env tests: reset/step contract, determinism, episode
machinery, Gym-style wrapper (SURVEY.md §4.2)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gym_futbol_tpu import EnvParams, FutbolEnv, obs_size, reset, step


P = EnvParams(players_per_team=2)


def random_actions(key, params):
    return jax.random.randint(key, (params.n_players, 2), 0, 5, dtype=jnp.int32)


class TestResetStep:
    def test_reset_contract(self, key):
        state, obs = reset(key, P)
        assert obs.shape == (obs_size(P),)
        assert state.pos.shape == (P.n_bodies, 2)
        assert int(state.t) == 0
        assert np.asarray(state.score).tolist() == [0, 0]
        assert int(state.possession) == -1

    def test_reset_positions_on_field(self, key):
        state, _ = reset(key, P)
        pos = np.asarray(state.pos)
        assert (pos[:, 0] >= 0).all() and (pos[:, 0] <= P.width).all()
        assert (pos[:, 1] >= 0).all() and (pos[:, 1] <= P.height).all()

    def test_step_contract(self, key):
        state, _ = reset(key, P)
        a = jnp.zeros((P.n_players, 2), jnp.int32)
        state, out = step(state, a, P)
        assert out.obs.shape == (obs_size(P),)
        assert out.reward.shape == ()
        assert out.team_reward.shape == (2,)
        assert out.done.shape == ()
        assert int(state.t) == 1

    def test_determinism(self, key):
        """Same seed, same actions => identical trajectories (fixed-seed
        reproducibility, the property behind BASELINE config 1)."""
        trajs = []
        for _ in range(2):
            state, obs = reset(key, P)
            acc = [np.asarray(obs)]
            akey = jax.random.PRNGKey(42)
            for _ in range(50):
                akey, k = jax.random.split(akey)
                state, out = step(state, random_actions(k, P), P)
                acc.append(np.asarray(out.obs))
            trajs.append(np.stack(acc))
        np.testing.assert_array_equal(trajs[0], trajs[1])

    def test_seeds_differ(self):
        s0, o0 = reset(jax.random.PRNGKey(0), P)
        s1, o1 = reset(jax.random.PRNGKey(1), P)
        assert not np.array_equal(np.asarray(o0), np.asarray(o1))

    def test_done_at_max_steps(self, key):
        p = EnvParams(players_per_team=1, max_steps=5)
        state, _ = reset(key, p)
        a = jnp.zeros((p.n_players, 2), jnp.int32)
        for i in range(5):
            state, out = step(state, a, p)
        assert bool(out.done)

    def test_finite_long_run(self, key):
        state, _ = reset(key, P)
        akey = jax.random.PRNGKey(7)
        for _ in range(200):
            akey, k = jax.random.split(akey)
            state, out = step(state, random_actions(k, P), P)
        assert np.isfinite(np.asarray(state.pos)).all()
        assert np.isfinite(np.asarray(state.vel)).all()
        assert np.isfinite(float(out.reward))


class TestScoring:
    def test_goal_increments_score_and_resets_positions(self, key):
        """Place the ball just beyond the right goal line: team 0 scores,
        kickoff re-placement follows (scoring reset, SURVEY.md §2.1 #7)."""
        state, _ = reset(key, P)
        state = state.replace(
            pos=state.pos.at[0].set(jnp.asarray([P.width + 1.0, P.height / 2])),
            vel=state.vel.at[0].set(jnp.asarray([0.0, 0.0])),
        )
        a = jnp.zeros((P.n_players, 2), jnp.int32)
        state, out = step(state, a, P)
        assert np.asarray(out.info["goal"]).tolist() == [True, False]
        assert np.asarray(state.score).tolist() == [1, 0]
        # ball back near the center after kickoff
        ball = np.asarray(state.pos[0])
        assert abs(ball[0] - P.width / 2) < 0.05 * P.height + 1.0
        assert int(state.possession) == -1

    def test_score_persists_across_goals(self, key):
        state, _ = reset(key, P)
        a = jnp.zeros((P.n_players, 2), jnp.int32)
        for _ in range(2):
            state = state.replace(
                pos=state.pos.at[0].set(jnp.asarray([-1.0, P.height / 2])),
                vel=state.vel.at[0].set(jnp.asarray([0.0, 0.0])),
            )
            state, out = step(state, a, P)
        assert np.asarray(state.score).tolist() == [0, 2]


class TestWrapper:
    def test_gym_convention(self):
        env = FutbolEnv(EnvParams(players_per_team=1), seed=3)
        obs = env.reset()
        assert env.observation_space.shape == obs.shape
        a = env.action_space.sample(jax.random.PRNGKey(0))
        obs, rew, done, info = env.step(a)
        assert isinstance(done, bool)
        assert "score" in info

    def test_render_ansi(self):
        env = FutbolEnv(EnvParams(players_per_team=1), seed=3)
        env.reset()
        s = env.render(mode="ansi")
        assert "score 0:0" in s


class TestDtype:
    @pytest.mark.parametrize("dtype", [jnp.float32])
    def test_dtype_threading(self, key, dtype):
        state, obs = reset(key, P, dtype)
        assert state.pos.dtype == dtype
        state, out = step(state, jnp.zeros((P.n_players, 2), jnp.int32), P)
        assert state.pos.dtype == dtype
        assert out.obs.dtype == dtype
