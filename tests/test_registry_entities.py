"""Registry (gym.make equivalent) and entity-view tests (SURVEY.md §2.1
#1, #5)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gym_futbol_tpu import (
    Ball,
    EnvParams,
    Player,
    Team,
    make,
    make_params,
    register,
    registered_ids,
    reset,
    step,
)


class TestRegistry:
    def test_default_ids(self):
        ids = registered_ids()
        assert "futbol-v0" in ids
        for ppt in (1, 2, 3, 4, 5):
            assert f"futbol-{ppt}v{ppt}-v0" in ids

    def test_make_params_and_overrides(self):
        p = make_params("futbol-3v3-v0")
        assert p.players_per_team == 3
        p = make_params("futbol-v0", max_steps=7)
        assert p.max_steps == 7 and p.players_per_team == 2

    def test_make_returns_gym_style_env(self):
        env = make("futbol-1v1-v0", seed=1)
        obs = env.reset()
        a = jnp.zeros((env.params.n_players, 2), jnp.int32)
        obs, r, done, info = env.step(a)
        assert np.isfinite(float(r))

    def test_unknown_id_raises(self):
        with pytest.raises(KeyError):
            make_params("nope-v0")

    def test_duplicate_register_raises(self):
        with pytest.raises(ValueError):
            register("futbol-v0", EnvParams)


class TestEntities:
    def test_views_single_env(self, key):
        p = EnvParams(players_per_team=2)
        state, _ = reset(key, p)
        ball = Ball(state)
        np.testing.assert_array_equal(
            np.asarray(ball.position), np.asarray(state.pos[0])
        )
        assert bool(ball.is_free)

        p1 = Player(state, 1, p)
        p3 = Player(state, 3, p)
        assert p1.team == 0 and p3.team == 1
        assert not bool(p1.has_ball)

        t0, t1 = Team(state, 0, p), Team(state, 1, p)
        assert t0.positions.shape == (2, 2)
        assert len(t0.players) == 2
        assert int(t0.score) == 0
        assert not bool(t1.has_ball)

    def test_views_batched(self, key):
        from gym_futbol_tpu.vector import reset_batch

        p = EnvParams(players_per_team=3)
        state, _ = reset_batch(key, p, 8)
        assert Ball(state).position.shape == (8, 2)
        assert Team(state, 1, p).positions.shape == (8, 3, 2)
        assert Player(state, 2, p).has_ball.shape == (8,)

    def test_player_index_bounds(self, key):
        p = EnvParams(players_per_team=1)
        state, _ = reset(key, p)
        with pytest.raises(IndexError):
            Player(state, 0, p)   # ball is not a player
        with pytest.raises(IndexError):
            Player(state, 3, p)

    def test_team_has_ball_after_grab(self, key):
        p = EnvParams(players_per_team=1)
        state, _ = reset(key, p)
        state = state.replace(possession=jnp.asarray(2, jnp.int32))
        assert not bool(Team(state, 0, p).has_ball)
        assert bool(Team(state, 1, p).has_ball)
        assert bool(Player(state, 2, p).has_ball)
