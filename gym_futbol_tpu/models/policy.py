"""Actor-critic policy network for FutbolEnv.

The reference trains stable-baselines ``PPO2("MlpPolicy", env)`` (SURVEY.md
§3.5 [RECALL-M]) — a small MLP over the flat observation. Ours is the flax
equivalent, TPU-shaped: one shared torso, one categorical head per
(player, action-slot) pair (direction in 5, act in 5 — the ACTION SPEC in
:mod:`gym_futbol_tpu.game`), and a value head. Widths default to multiples
of 128 so the matmuls tile cleanly onto the MXU even at small batch.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..types import EnvParams


class ActorCritic(nn.Module):
    """Shared-torso MLP actor-critic.

    Output logits shape [B, n_players, 2, 5]: per player, slot 0 is the
    direction distribution, slot 1 the act distribution.
    """

    n_players: int
    hidden: Sequence[int] = (256, 256)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, obs: jax.Array) -> tuple[jax.Array, jax.Array]:
        x = obs.astype(self.dtype)
        for w in self.hidden:
            x = nn.Dense(w, dtype=self.dtype)(x)
            x = nn.tanh(x)
        logits = nn.Dense(self.n_players * 2 * 5, dtype=self.dtype)(x)
        logits = logits.reshape(obs.shape[:-1] + (self.n_players, 2, 5))
        value = nn.Dense(1, dtype=self.dtype)(x)
        return logits, value.squeeze(-1)


def sample_actions(
    key: jax.Array, logits: jax.Array
) -> tuple[jax.Array, jax.Array]:
    """Sample joint actions from [.., n_players, 2, 5] logits.

    Returns (actions int32 [.., n_players, 2], joint log-prob [..]).
    """
    actions = jax.random.categorical(key, logits, axis=-1).astype(jnp.int32)
    logp = jax.nn.log_softmax(logits, axis=-1)
    taken = jnp.take_along_axis(logp, actions[..., None], axis=-1).squeeze(-1)
    return actions, taken.sum(axis=(-1, -2))


def action_log_prob_and_entropy(
    logits: jax.Array, actions: jax.Array
) -> tuple[jax.Array, jax.Array]:
    """Joint log-prob of given actions and total entropy of the joint
    (sum over the independent per-player, per-slot categoricals)."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    taken = jnp.take_along_axis(logp, actions[..., None], axis=-1).squeeze(-1)
    probs = jnp.exp(logp)
    ent = -(probs * logp).sum(axis=-1)
    return taken.sum(axis=(-1, -2)), ent.sum(axis=(-1, -2))


def make_policy_fn(model: ActorCritic, params):
    """Adapter to the ``rollout(policy)`` signature in
    :mod:`gym_futbol_tpu.vector`."""

    def policy(key: jax.Array, obs: jax.Array) -> jax.Array:
        logits, _ = model.apply(params, obs)
        actions, _ = sample_actions(key, logits)
        return actions

    return policy


def init_params(key: jax.Array, model: ActorCritic, env_params: EnvParams):
    from ..env import obs_size

    dummy = jnp.zeros((1, obs_size(env_params)), model.dtype)
    return model.init(key, dummy)
