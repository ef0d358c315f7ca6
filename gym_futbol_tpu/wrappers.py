"""Pure-functional env wrappers (episode stats, observation AND
reward/return normalization).

The reference's users get these from the stable-baselines VecEnv ecosystem
(`VecMonitor`, `VecNormalize` — SURVEY.md §2.1 #12). Here each wrapper is
a (state, fn) pair over the batched pure API, so wrapped envs stay fully
jit/vmap/shard_map-compatible and run inside lax.scan rollouts. All
running statistics accept an ``axis_name`` so sharded training keeps ONE
global normalizer (pmean'd batch stats) instead of per-shard drift.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import struct

from .types import EnvParams, EnvState, StepOutput
from .vector import step_batch


# ---------------------------------------------------------------------------
# Episode statistics (VecMonitor equivalent)
# ---------------------------------------------------------------------------


@struct.dataclass
class EpisodeStats:
    """Per-env running episode accumulators + last-completed snapshots.

    All [B]; read ``last_return``/``last_length`` wherever ``done`` was
    True that step.
    """

    acc_return: jax.Array     # [B] running sum of team-0 reward
    acc_length: jax.Array     # [B] running step count
    last_return: jax.Array    # [B] return of the most recent finished episode
    last_length: jax.Array    # [B]
    episodes: jax.Array       # [B] finished-episode count

    @classmethod
    def init(cls, n_envs: int, dtype=jnp.float32) -> "EpisodeStats":
        z = jnp.zeros((n_envs,), dtype)
        zi = jnp.zeros((n_envs,), jnp.int32)
        return cls(acc_return=z, acc_length=zi, last_return=z,
                   last_length=zi, episodes=zi)


def step_with_stats(
    state: EnvState, stats: EpisodeStats, actions: jax.Array,
    params: EnvParams,
) -> tuple[EnvState, EpisodeStats, StepOutput]:
    """step_batch + episode accounting (auto-reset aware)."""
    state, out = step_batch(state, actions, params)
    acc_r = stats.acc_return + out.reward
    acc_l = stats.acc_length + 1
    done = out.done
    stats = EpisodeStats(
        acc_return=jnp.where(done, 0.0, acc_r),
        acc_length=jnp.where(done, 0, acc_l),
        last_return=jnp.where(done, acc_r, stats.last_return),
        last_length=jnp.where(done, acc_l, stats.last_length),
        episodes=stats.episodes + done.astype(jnp.int32),
    )
    return state, stats, out


# ---------------------------------------------------------------------------
# Observation normalization (VecNormalize equivalent, obs side)
# ---------------------------------------------------------------------------


@struct.dataclass
class RunningNorm:
    """Batched Welford running mean/var over observations."""

    mean: jax.Array    # [obs_dim]
    var: jax.Array     # [obs_dim]
    count: jax.Array   # []

    @classmethod
    def init(cls, obs_dim: int, dtype=jnp.float32) -> "RunningNorm":
        return cls(
            mean=jnp.zeros((obs_dim,), dtype),
            var=jnp.ones((obs_dim,), dtype),
            count=jnp.asarray(1e-4, dtype),
        )

    def update(
        self, obs: jax.Array, axis_name: str | None = None
    ) -> "RunningNorm":
        """obs: [B, obs_dim]. Chan et al. parallel-merge update.

        ``axis_name`` makes the batch statistics GLOBAL across a mesh
        axis (pmean over equal-size shards) so normalized sharded
        training uses one consistent normalizer instead of per-shard
        statistics drifting apart.
        """
        return self.update_moments(
            obs.mean(axis=0), obs.var(axis=0),
            jnp.asarray(obs.shape[0], obs.dtype), axis_name=axis_name,
        )

    def update_moments(
        self, b_mean: jax.Array, b_var: jax.Array, b_count: jax.Array,
        axis_name: str | None = None,
    ) -> "RunningNorm":
        """Merge pre-computed batch moments (mean/var [obs_dim], count
        []). Lets feature-major consumers (the fused-collect [F, N]
        trajectory buffer) update the normalizer without ever
        materializing a row-major copy."""
        if axis_name is not None:
            g_mean = jax.lax.pmean(b_mean, axis_name)
            g_sq = jax.lax.pmean(b_var + b_mean**2, axis_name)
            b_var = g_sq - g_mean**2
            b_mean = g_mean
            b_count = b_count * jax.lax.psum(
                jnp.asarray(1, b_count.dtype), axis_name
            )
        delta = b_mean - self.mean
        tot = self.count + b_count
        mean = self.mean + delta * b_count / tot
        m_a = self.var * self.count
        m_b = b_var * b_count
        m2 = m_a + m_b + delta**2 * self.count * b_count / tot
        return RunningNorm(mean=mean, var=m2 / tot, count=tot)

    def normalize(self, obs: jax.Array, clip: float = 10.0) -> jax.Array:
        z = (obs - self.mean) / jnp.sqrt(self.var + 1e-8)
        return jnp.clip(z, -clip, clip)


def step_normalized(
    state: EnvState, norm: RunningNorm, actions: jax.Array,
    params: EnvParams, update: bool = True,
    axis_name: str | None = None,
) -> tuple[EnvState, RunningNorm, StepOutput]:
    """step_batch returning normalized observations (stats updated on the
    raw obs unless ``update=False`` for eval)."""
    state, out = step_batch(state, actions, params)
    if update:
        norm = norm.update(out.obs, axis_name=axis_name)
    out = out.replace(obs=norm.normalize(out.obs))
    return state, norm, out


# ---------------------------------------------------------------------------
# Reward / return normalization (VecNormalize equivalent, reward side)
# ---------------------------------------------------------------------------


@struct.dataclass
class RewardNorm:
    """Running discounted-return variance, stable-baselines VecNormalize
    semantics: rewards are scaled by 1/std(returns) (mean NOT subtracted,
    so reward signs are preserved)."""

    ret: jax.Array      # [B] per-env discounted return accumulator
    mean: jax.Array     # [] running mean of returns (tracked, unused)
    var: jax.Array      # [] running variance of returns
    count: jax.Array    # []

    @classmethod
    def init(cls, n_envs: int, dtype=jnp.float32) -> "RewardNorm":
        return cls(
            ret=jnp.zeros((n_envs,), dtype),
            mean=jnp.zeros((), dtype),
            var=jnp.ones((), dtype),
            count=jnp.asarray(1e-4, dtype),
        )

    def update(
        self, reward: jax.Array, done: jax.Array, gamma: float = 0.99,
        axis_name: str | None = None,
    ) -> "RewardNorm":
        """Fold one step's rewards ([B]) into the return statistics; the
        accumulator zeroes where episodes ended. ``axis_name`` pmean's
        the batch statistics across the mesh (see RunningNorm.update)."""
        ret = self.ret * jnp.asarray(gamma, reward.dtype) + reward
        b_mean = ret.mean()
        b_var = ret.var()
        b_count = jnp.asarray(ret.shape[0], reward.dtype)
        if axis_name is not None:
            g_mean = jax.lax.pmean(b_mean, axis_name)
            g_sq = jax.lax.pmean(b_var + b_mean**2, axis_name)
            b_var = g_sq - g_mean**2
            b_mean = g_mean
            b_count = b_count * jax.lax.psum(
                jnp.asarray(1, reward.dtype), axis_name
            )
        delta = b_mean - self.mean
        tot = self.count + b_count
        mean = self.mean + delta * b_count / tot
        m2 = (self.var * self.count + b_var * b_count
              + delta**2 * self.count * b_count / tot)
        ret = jnp.where(done, 0.0, ret)
        return RewardNorm(ret=ret, mean=mean, var=m2 / tot, count=tot)

    def normalize(self, reward: jax.Array, clip: float = 10.0) -> jax.Array:
        z = reward / jnp.sqrt(self.var + 1e-8)
        return jnp.clip(z, -clip, clip)


def step_reward_normalized(
    state: EnvState, rnorm: RewardNorm, actions: jax.Array,
    params: EnvParams, gamma: float = 0.99, update: bool = True,
    axis_name: str | None = None,
) -> tuple[EnvState, RewardNorm, StepOutput]:
    """step_batch with VecNormalize-style reward scaling: ``out.reward``
    (and ``out.team_reward``) divided by the running std of discounted
    returns. Stats follow the team-0 reward (the gym-facing signal)."""
    state, out = step_batch(state, actions, params)
    if update:
        rnorm = rnorm.update(out.reward, out.done, gamma,
                             axis_name=axis_name)
    out = out.replace(
        reward=rnorm.normalize(out.reward),
        team_reward=rnorm.normalize(out.team_reward),
    )
    return state, rnorm, out
