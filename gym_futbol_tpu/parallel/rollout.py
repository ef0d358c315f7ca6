"""Sharded rollout and training over the 'env' mesh axis.

Two idiomatic paths are provided (the scaling-book recipe: annotate
shardings, let XLA insert collectives):

- :func:`shard_rollout` — jit + NamedSharding. The env batch is sharded
  over 'env'; the step itself is collective-free, so XLA compiles a pure
  SPMD program with no communication.
- :func:`shard_train_iteration` — ``shard_map`` of the full PPO iteration
  with an explicit ``pmean`` over gradients/metrics (the one collective;
  SURVEY.md §2.3, §3.6). shard_map is used here because the minibatch
  permutation inside the update must be *per-shard* (device-local
  trajectories), which auto-sharding cannot express.

Both run unchanged on 1 real chip, 8 fake CPU devices, or a multi-host
pod slice (BASELINE configs 4-5).
"""

from __future__ import annotations

from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

shard_map = jax.shard_map

from .. import vector
from ..ppo import PPOConfig, RunnerState, train_iteration
from ..types import EnvParams, EnvState
from .mesh import ENV_AXIS, env_sharding


def shard_env_state(state, mesh: Mesh):
    """Place a batched EnvState (or any env-leading pytree) on the mesh,
    sharded over its leading axis."""
    sh = env_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), state)


def shard_rollout(
    mesh: Mesh, params: EnvParams, n_steps: int,
    policy: Callable[[jax.Array, jax.Array], jax.Array] | None = None,
):
    """Compile a sharded T-step rollout. Returns f(state, key) ->
    (state, outs) with the env batch sharded over 'env'."""
    policy = policy or vector.random_policy(params)

    sh_env = env_sharding(mesh)

    @partial(jax.jit, donate_argnums=(0,))
    def run(state: EnvState, key: jax.Array):
        state = jax.lax.with_sharding_constraint(state, sh_env)
        return vector.rollout(state, policy, key, params, n_steps)

    return run


def shard_fused_rollout(
    mesh: Mesh, params: EnvParams, n_steps: int, block: int = 2048,
    interpret: bool = False,
):
    """The Pallas fused-rollout kernel (ops/fused_rollout.py) composed
    with the 'env' mesh: each device runs the whole-T-steps kernel on its
    local env shard — still zero collectives on the step path.

    Returns f(statef, statei, seed) -> (statef, statei, rewards), jitted,
    where statef/statei are the packed tile layout (ops.pack_state) with
    the tile axis (dim 1) sharded over 'env'. The per-device env count
    must be a multiple of ``block``. Per-shard PRNG streams are
    de-correlated by folding the mesh position into the seed.
    """
    from ..ops import fused_rollout

    def local(statef, statei, seed):
        seed = seed + jax.lax.axis_index(ENV_AXIS) * jnp.int32(0x1F123BB5)
        return fused_rollout(
            statef, statei, seed, params, n_steps, block, interpret
        )

    tiles = P(None, ENV_AXIS, None)
    mapped = shard_map(
        local,
        mesh=mesh,
        in_specs=(tiles, tiles, P()),
        out_specs=(tiles, tiles, tiles),
        check_vma=False,
    )
    return jax.jit(mapped, donate_argnums=(0, 1))


def ppo_runner_specs(
    normalize_obs: bool = False, normalize_reward: bool = False,
):
    """PartitionSpec pytree for a ppo.RunnerState: envs/trajectory
    device-local, model/optimizer replicated. The VecNormalize stats
    (when enabled) are replicated — their batch updates are pmean'd over
    the mesh (wrappers.RunningNorm.update), so every shard carries the
    ONE global normalizer — except RewardNorm's per-env return
    accumulator, which lives with its envs."""
    from ..wrappers import RewardNorm, RunningNorm

    env_spec = P(ENV_AXIS)
    rep = P()
    obs_norm = (
        RunningNorm(mean=rep, var=rep, count=rep) if normalize_obs else None
    )
    rew_norm = (
        RewardNorm(ret=env_spec, mean=rep, var=rep, count=rep)
        if normalize_reward else None
    )
    return RunnerState(
        params=rep,
        opt_state=rep,
        env_state=EnvState(
            pos=env_spec, vel=env_spec, possession=env_spec,
            score=env_spec, t=env_spec, key=env_spec,
        ),
        obs=env_spec,
        key=rep,  # same update RNG on every shard => replicated params stay in lockstep
        obs_norm=obs_norm,
        rew_norm=rew_norm,
    )


def shard_train_iteration(
    mesh: Mesh, model, env_params: EnvParams, cfg, tx,
    iteration_fn=train_iteration, runner_specs=None,
):
    """shard_map'd full training iteration: envs + trajectories
    device-local, model/opt state replicated, grads pmean'd over 'env'.

    ``iteration_fn`` defaults to PPO's; any function with the signature
    ``(runner, model, env_params, cfg, tx, axis_name) -> (runner, metrics)``
    works (e.g. :func:`gym_futbol_tpu.a2c.train_iteration`).
    ``runner_specs`` overrides the PartitionSpec pytree for non-default
    runner structures (e.g. ``a2c.recurrent_runner_specs()`` for the
    LSTM carry). Returns f(runner) -> (runner, metrics), jitted.
    """

    def local_iter(runner):
        # De-correlate per-shard action sampling / minibatch permutations;
        # params stay in lockstep because grads are pmean'd before applying.
        base_key, next_key = jax.random.split(runner.key)
        shard_key = jax.random.fold_in(base_key, jax.lax.axis_index(ENV_AXIS))
        runner, metrics = iteration_fn(
            runner.replace(key=shard_key), model, env_params, cfg, tx,
            axis_name=ENV_AXIS,
        )
        # hand back the replicated successor key so the out_spec P() holds
        return runner.replace(key=next_key), metrics

    rep = P()
    if runner_specs is None:
        runner_specs = ppo_runner_specs()

    mapped = shard_map(
        local_iter,
        mesh=mesh,
        in_specs=(runner_specs,),
        out_specs=(runner_specs, rep),
        check_vma=False,
    )
    return jax.jit(mapped, donate_argnums=(0,))
