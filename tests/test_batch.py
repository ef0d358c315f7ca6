"""Batch-invariance and auto-reset tests (SURVEY.md §4.2 items 2-3):
vmap'd step over N envs must equal N independent single-env steps."""

import jax
import jax.numpy as jnp
import numpy as np

from gym_futbol_tpu import EnvParams, reset, step
from gym_futbol_tpu.vector import (
    STATE_AXES,
    random_policy,
    reset_batch,
    rollout,
    step_batch,
)


P = EnvParams(players_per_team=2)


class TestBatchInvariance:
    def test_vmap_equals_loop(self, key):
        n = 8
        keys = jax.random.split(key, n)
        akey = jax.random.PRNGKey(9)
        actions = jax.random.randint(akey, (n, P.n_players, 2), 0, 5,
                                     dtype=jnp.int32)

        # batched path
        bstate, bobs = reset_batch(key, P, n)
        # NOTE: reset_batch splits `key` the same way we do here
        bstate2, bout = jax.vmap(
            lambda s, a: step(s, a, P),
            in_axes=(STATE_AXES, 0), out_axes=(STATE_AXES, 0),
        )(bstate, actions)

        # single-env path
        for i in range(n):
            s, o = reset(keys[i], P)
            np.testing.assert_array_equal(np.asarray(o), np.asarray(bobs[i]))
            s2, out = step(s, actions[i], P)
            np.testing.assert_array_equal(
                np.asarray(out.obs), np.asarray(bout.obs[i])
            )
            np.testing.assert_array_equal(
                np.asarray(out.reward), np.asarray(bout.reward[i])
            )

    def test_env_rng_streams_independent(self, key):
        n = 4
        state, _ = reset_batch(key, P, n)
        keys = np.asarray(state.key)  # batch-leading: [B, key_words]
        assert len({tuple(k) for k in keys}) == n


class TestAutoReset:
    def test_auto_reset_on_done(self, key):
        p = EnvParams(players_per_team=1, max_steps=3)
        n = 4
        state, _ = reset_batch(key, p, n)
        a = jnp.zeros((n, p.n_players, 2), jnp.int32)
        for i in range(3):
            state, out = step_batch(state, a, p)
        # out reports the terminal transition; carried state is reset
        assert bool(jnp.all(out.done))
        assert np.asarray(state.t).tolist() == [0] * n
        assert (np.asarray(state.score) == 0).all()

    def test_no_reset_before_done(self, key):
        p = EnvParams(players_per_team=1, max_steps=100)
        state, _ = reset_batch(key, p, 4)
        a = jnp.zeros((4, p.n_players, 2), jnp.int32)
        state, out = step_batch(state, a, p)
        assert not bool(jnp.any(out.done))
        assert np.asarray(state.t).tolist() == [1] * 4


class TestRollout:
    def test_rollout_shapes_and_finiteness(self, key):
        n, t = 16, 50
        state, _ = reset_batch(key, P, n)
        policy = random_policy(P)
        state, outs = rollout(state, policy, jax.random.PRNGKey(1), P, t)
        assert outs.obs.shape[:2] == (t, n)
        assert outs.reward.shape == (t, n)
        assert np.isfinite(np.asarray(outs.obs)).all()

    def test_rollout_jit_compatible(self, key):
        n, t = 8, 10
        state, _ = reset_batch(key, P, n)
        policy = random_policy(P)
        f = jax.jit(lambda s, k: rollout(s, policy, k, P, t))
        state2, outs = f(state, jax.random.PRNGKey(1))
        assert outs.reward.shape == (t, n)
