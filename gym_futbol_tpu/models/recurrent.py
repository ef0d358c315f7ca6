"""Recurrent (LSTM) actor-critic for FutbolEnv.

The stable-baselines policy family the reference trains with includes
``MlpLstmPolicy`` alongside ``MlpPolicy`` (SURVEY.md §3.5). This is the
flax equivalent: an MLP torso, an LSTM cell carried across env steps
(reset where ``done``), and the same flat-logits categorical heads as
:mod:`gym_futbol_tpu.models.policy` (layout notes there apply — all
categorical math stays in row form).

The hidden state is part of the rollout carry, so recurrent rollouts are
still a single ``lax.scan`` on device; a whole A2C-style iteration stays
one jittable function (recurrent PPO epoch-shuffling is intentionally
out of scope — full-batch updates keep the sequence structure intact).
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..types import EnvParams
from .policy import N_CHOICES


class RecurrentActorCritic(nn.Module):
    """MLP torso -> LSTM cell -> flat categorical heads + value head.

    ``__call__(carry, obs) -> (new_carry, (logits [B, n_players*2*5],
    value [B]))``. Use :meth:`initial_carry` for the zero state.
    """

    n_players: int
    hidden: Sequence[int] = (128,)
    lstm_size: int = 128
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, carry, obs: jax.Array):
        x = obs.astype(self.dtype)
        for w in self.hidden:
            x = nn.Dense(w, dtype=self.dtype)(x)
            x = nn.tanh(x)
        carry, x = nn.OptimizedLSTMCell(self.lstm_size, dtype=self.dtype)(
            carry, x
        )
        logits = nn.Dense(self.n_players * 2 * N_CHOICES, dtype=self.dtype)(x)
        value = nn.Dense(1, dtype=self.dtype)(x)
        return carry, (logits, value.squeeze(-1))

    def initial_carry(self, batch_size: int):
        z = jnp.zeros((batch_size, self.lstm_size), self.dtype)
        return (z, z)


def reset_carry_where_done(carry, done: jax.Array):
    """Zero the LSTM state of finished episodes (done: [B] bool)."""
    mask = 1.0 - done.astype(carry[0].dtype)[:, None]
    return tuple(c * mask for c in carry)


def init_recurrent_params(
    key: jax.Array, model: RecurrentActorCritic, env_params: EnvParams,
    batch_size: int = 1,
):
    from ..env import obs_size

    dummy = jnp.zeros((batch_size, obs_size(env_params)), model.dtype)
    return model.init(key, model.initial_carry(batch_size), dummy)


def recurrent_rollout(
    params, model: RecurrentActorCritic, env_state, obs, carry,
    key: jax.Array, env_params: EnvParams, n_steps: int,
):
    """T recurrent steps fully on-device. Returns (env_state, obs, carry,
    (logits, value, actions, logp, reward, done) stacked [T, ...])."""
    from ..vector import step_batch
    from .policy import sample_actions

    def body(c, _):
        env_state, obs, carry, key = c
        key, k_act = jax.random.split(key)
        carry, (logits, value) = model.apply(params, carry, obs)
        actions, logp = sample_actions(k_act, logits)
        env_state, out = step_batch(env_state, actions, env_params)
        carry = reset_carry_where_done(carry, out.done)
        ys = (value, logp, out.reward, out.done)
        return (env_state, out.obs, carry, key), ys

    (env_state, obs, carry, _), ys = jax.lax.scan(
        body, (env_state, obs, carry, key), None, length=n_steps
    )
    return env_state, obs, carry, ys
