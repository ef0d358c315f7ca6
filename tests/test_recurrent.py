"""Recurrent (LSTM) actor-critic: shapes, carry reset, on-device rollout."""

import jax
import jax.numpy as jnp
import numpy as np

from gym_futbol_tpu import EnvParams
from gym_futbol_tpu.models.recurrent import (
    RecurrentActorCritic,
    init_recurrent_params,
    recurrent_rollout,
    reset_carry_where_done,
)
from gym_futbol_tpu.vector import reset_batch

P = EnvParams(players_per_team=1, substeps=2, solver_iterations=3, max_steps=6)


class TestRecurrent:
    def test_forward_shapes(self, key):
        model = RecurrentActorCritic(n_players=P.n_players, hidden=(16,),
                                     lstm_size=16)
        params = init_recurrent_params(key, model, P, batch_size=4)
        obs = jax.random.normal(key, (4, 4 * P.n_bodies + 2))
        carry = model.initial_carry(4)
        carry2, (logits, value) = model.apply(params, carry, obs)
        assert logits.shape == (4, P.n_players * 2 * 5)
        assert value.shape == (4,)
        assert carry2[0].shape == (4, 16) and carry2[1].shape == (4, 16)
        # state actually carries information
        carry3, (logits2, _) = model.apply(params, carry2, obs)
        assert not np.allclose(np.asarray(logits), np.asarray(logits2))

    def test_carry_resets_on_done(self):
        c = (jnp.ones((3, 4)), 2.0 * jnp.ones((3, 4)))
        done = jnp.asarray([True, False, True])
        c2 = reset_carry_where_done(c, done)
        np.testing.assert_array_equal(np.asarray(c2[0][0]), np.zeros(4))
        np.testing.assert_array_equal(np.asarray(c2[0][1]), np.ones(4))
        np.testing.assert_array_equal(np.asarray(c2[1][2]), np.zeros(4))

    def test_rollout_runs(self, key):
        model = RecurrentActorCritic(n_players=P.n_players, hidden=(16,),
                                     lstm_size=16)
        params = init_recurrent_params(key, model, P, batch_size=8)
        state, obs = reset_batch(key, P, 8)
        carry = model.initial_carry(8)
        run = jax.jit(lambda s, o, c, k: recurrent_rollout(
            params, model, s, o, c, k, P, n_steps=13))
        state, obs, carry, (value, logp, reward, done) = run(
            state, obs, carry, jax.random.PRNGKey(1))
        assert value.shape == (13, 8) and reward.shape == (13, 8)
        assert np.isfinite(np.asarray(value)).all()
        assert np.isfinite(np.asarray(logp)).all()
        # episodes end at max_steps=6 -> dones occurred -> some carries zeroed
        assert np.asarray(done).sum() > 0
