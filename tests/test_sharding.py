"""Multi-device tests on the fake 8-device CPU mesh (SURVEY.md §4.2 item 4;
BASELINE configs 4-5 logic). These exercise the same code paths that run on
a real pod slice — shard_map semantics are device-count agnostic."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gym_futbol_tpu import EnvParams
from gym_futbol_tpu.models.policy import ActorCritic
from gym_futbol_tpu.parallel import (
    env_sharding,
    make_mesh,
    shard_env_state,
    shard_rollout,
    shard_train_iteration,
)
from gym_futbol_tpu.ppo import PPOConfig, init_runner, make_optimizer
from gym_futbol_tpu.vector import reset_batch


P = EnvParams(players_per_team=2)


@pytest.fixture(scope="module")
def mesh():
    assert jax.device_count() == 8, "conftest must force 8 fake CPU devices"
    return make_mesh()


class TestShardedRollout:
    def test_rollout_sharded_over_env(self, mesh, key):
        n, t = 64, 20
        state, _ = reset_batch(key, P, n)
        state = shard_env_state(state, mesh)
        assert state.pos.sharding.is_equivalent_to(env_sharding(mesh), 3)

        run = shard_rollout(mesh, P, t)
        state, outs = run(state, jax.random.PRNGKey(1))
        assert outs.reward.shape == (t, n)
        assert np.isfinite(np.asarray(outs.reward)).all()

    def test_sharded_matches_single_device(self, mesh, key):
        """The sharded rollout must be bitwise-identical in semantics to the
        unsharded one (pure SPMD, no collectives in the env step)."""
        from gym_futbol_tpu.vector import random_policy, rollout

        n, t = 16, 10
        state, _ = reset_batch(key, P, n)
        policy = random_policy(P)
        k = jax.random.PRNGKey(1)
        _, outs_ref = rollout(state, policy, k, P, t)

        state2, _ = reset_batch(key, P, n)
        state2 = shard_env_state(state2, mesh)
        run = shard_rollout(mesh, P, t)
        _, outs_sh = run(state2, k)
        np.testing.assert_array_equal(
            np.asarray(outs_ref.reward), np.asarray(outs_sh.reward)
        )
        np.testing.assert_array_equal(
            np.asarray(outs_ref.obs), np.asarray(outs_sh.obs)
        )


class TestShardedTraining:
    def test_train_iteration_runs_and_keeps_params_replicated(self, mesh, key):
        env_params = EnvParams(players_per_team=1, max_steps=32)
        cfg = PPOConfig(rollout_steps=8, epochs=1, minibatches=2)
        model = ActorCritic(n_players=env_params.players_per_team, hidden=(32,))
        tx = make_optimizer(cfg)
        runner = init_runner(key, model, env_params, cfg, n_envs=16, tx=tx)
        runner = runner.replace(env_state=shard_env_state(runner.env_state, mesh))

        step_fn = shard_train_iteration(mesh, model, env_params, cfg, tx)
        runner, metrics = step_fn(runner)
        assert np.isfinite(float(metrics["loss"]))
        assert np.isfinite(float(metrics["mean_reward"]))

        # params must be fully replicated (identical on all shards)
        leaves = jax.tree.leaves(runner.params)
        for leaf in leaves:
            assert leaf.sharding.is_fully_replicated
        runner, metrics2 = step_fn(runner)
        assert np.isfinite(float(metrics2["loss"]))

    def test_learning_signal_exists(self, mesh, key):
        """Loss changes across iterations — the update actually applies."""
        env_params = EnvParams(players_per_team=1, max_steps=32)
        cfg = PPOConfig(rollout_steps=8, epochs=1, minibatches=2, lr=1e-2)
        model = ActorCritic(n_players=env_params.players_per_team, hidden=(32,))
        tx = make_optimizer(cfg)
        runner = init_runner(key, model, env_params, cfg, n_envs=16, tx=tx)
        runner = runner.replace(env_state=shard_env_state(runner.env_state, mesh))
        step_fn = shard_train_iteration(mesh, model, env_params, cfg, tx)

        p0 = jax.tree.leaves(runner.params)[0].copy()
        runner, _ = step_fn(runner)
        p1 = jax.tree.leaves(runner.params)[0]
        assert not np.allclose(np.asarray(p0), np.asarray(p1))
