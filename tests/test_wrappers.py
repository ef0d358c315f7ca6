"""Tests for wrappers (episode stats, obs normalization) and evaluation."""

import jax
import jax.numpy as jnp
import numpy as np

from gym_futbol_tpu import EnvParams
from gym_futbol_tpu.evaluate import evaluate, joint_policy, mirror_obs, random_team_policy
from gym_futbol_tpu.vector import reset_batch
from gym_futbol_tpu.wrappers import (
    EpisodeStats,
    RunningNorm,
    step_normalized,
    step_with_stats,
)


P = EnvParams(players_per_team=1, max_steps=5)


class TestEpisodeStats:
    def test_episode_accounting(self, key):
        n = 4
        state, _ = reset_batch(key, P, n)
        stats = EpisodeStats.init(n)
        a = jnp.zeros((n, P.n_players, 2), jnp.int32)
        for t in range(5):
            state, stats, out = step_with_stats(state, stats, a, P)
        # all episodes finished exactly once at t=5
        assert np.asarray(stats.episodes).tolist() == [1] * n
        assert np.asarray(stats.last_length).tolist() == [5] * n
        # accumulators restarted
        assert np.asarray(stats.acc_length).tolist() == [0] * n

    def test_running_between_episodes(self, key):
        n = 2
        state, _ = reset_batch(key, P, n)
        stats = EpisodeStats.init(n)
        a = jnp.zeros((n, P.n_players, 2), jnp.int32)
        for t in range(3):
            state, stats, out = step_with_stats(state, stats, a, P)
        assert np.asarray(stats.acc_length).tolist() == [3, 3]
        assert np.asarray(stats.episodes).tolist() == [0, 0]


class TestRunningNorm:
    def test_matches_numpy_stats(self):
        rng = np.random.RandomState(0)
        data = rng.randn(10, 64, 6).astype(np.float32) * 3 + 1.5
        norm = RunningNorm.init(6)
        for batch in data:
            norm = norm.update(jnp.asarray(batch))
        flat = data.reshape(-1, 6)
        np.testing.assert_allclose(np.asarray(norm.mean), flat.mean(0), rtol=1e-3)
        np.testing.assert_allclose(np.asarray(norm.var), flat.var(0), rtol=1e-2)

    def test_step_normalized_runs(self, key):
        n = 8
        state, obs = reset_batch(key, P, n)
        norm = RunningNorm.init(obs.shape[-1])
        a = jnp.zeros((n, P.n_players, 2), jnp.int32)
        state, norm, out = step_normalized(state, norm, a, P)
        assert np.isfinite(np.asarray(out.obs)).all()
        assert float(norm.count) > 1.0


class TestEvaluate:
    def test_mirror_obs_involution(self, key):
        p = EnvParams(players_per_team=2)
        obs = jax.random.uniform(key, (7, 4 * p.n_bodies + 2))
        twice = mirror_obs(mirror_obs(obs, p), p)
        np.testing.assert_allclose(np.asarray(twice), np.asarray(obs), rtol=1e-6)

    def test_random_vs_random_roughly_fair(self):
        p = EnvParams(players_per_team=1, max_steps=60)
        res = evaluate(p, n_envs=64, n_steps=60, seed=3)
        # symmetric matchup: neither side dominates
        assert abs(float(res["win_rate_a"]) - float(res["win_rate_b"])) < 0.35
        assert res["goals"].shape == (2,)

    def test_joint_policy_shapes(self, key):
        p = EnvParams(players_per_team=2)
        pol = joint_policy(p, random_team_policy(p), random_team_policy(p))
        obs = jnp.zeros((5, 4 * p.n_bodies + 2))
        acts = pol(key, obs)
        assert acts.shape == (5, p.n_players, 2)
        assert (np.asarray(acts) >= 0).all() and (np.asarray(acts) < 5).all()


class TestRewardNorm:
    def test_returns_tracked_and_reset(self, key):
        from gym_futbol_tpu.wrappers import RewardNorm

        rn = RewardNorm.init(3)
        r = jnp.asarray([1.0, 2.0, 3.0])
        done = jnp.asarray([False, False, True])
        rn = rn.update(r, done, gamma=0.5)
        # accumulator: gamma*0 + r, then zeroed where done
        np.testing.assert_allclose(np.asarray(rn.ret), [1.0, 2.0, 0.0])
        rn = rn.update(r, jnp.zeros(3, bool), gamma=0.5)
        np.testing.assert_allclose(np.asarray(rn.ret), [1.5, 3.0, 3.0])

    def test_normalization_reaches_unit_scale(self, key):
        """After many updates on a fixed-scale reward stream, normalized
        rewards have ~unit return variance (VecNormalize semantics)."""
        from gym_futbol_tpu.wrappers import RewardNorm

        rng = np.random.RandomState(0)
        rn = RewardNorm.init(64)
        for t in range(200):
            r = jnp.asarray(rng.randn(64) * 7.0)
            rn = rn.update(r, jnp.zeros(64, bool), gamma=0.9)
        # var of discounted returns of N(0,49) with gamma .9:
        # 49/(1-.81) ~ 258 => std ~ 16
        z = rn.normalize(jnp.asarray(rng.randn(64) * 7.0))
        assert 0.2 < float(np.abs(np.asarray(z)).mean()) < 0.6
        # sign preserved, no mean subtraction
        assert float(rn.normalize(jnp.asarray([100.0]))[0]) > 0

    def test_step_reward_normalized_runs(self, key):
        from gym_futbol_tpu.wrappers import RewardNorm, step_reward_normalized

        n = 8
        state, _ = reset_batch(key, P, n)
        rn = RewardNorm.init(n)
        a = jnp.zeros((n, P.n_players, 2), jnp.int32)
        for _ in range(4):
            state, rn, out = step_reward_normalized(state, rn, a, P)
        assert np.isfinite(np.asarray(out.reward)).all()
        assert out.team_reward.shape == (n, 2)


class TestShardedNormStats:
    def test_pmean_update_matches_global(self, key):
        """RunningNorm.update(axis_name=...) under shard_map over the fake
        mesh must equal the unsharded update on the full batch."""
        from functools import partial

        from jax.sharding import PartitionSpec as Spec

        from gym_futbol_tpu.parallel import make_mesh

        obs = jax.random.normal(key, (64, 6)) * 3.0 + 1.0
        ref = RunningNorm.init(6).update(obs)

        mesh = make_mesh()

        @partial(
            jax.shard_map, mesh=mesh, in_specs=(Spec("env"),),
            out_specs=Spec(), check_vma=False,
        )
        def sharded_update(o):
            return RunningNorm.init(6).update(o, axis_name="env")

        got = sharded_update(obs)
        np.testing.assert_allclose(
            np.asarray(got.mean), np.asarray(ref.mean), rtol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(got.var), np.asarray(ref.var), rtol=1e-4
        )
        np.testing.assert_allclose(
            float(got.count), float(ref.count), rtol=1e-6
        )

    def test_pmean_reward_norm_matches_global(self, key):
        from functools import partial

        from jax.sharding import PartitionSpec as Spec

        from gym_futbol_tpu.parallel import make_mesh
        from gym_futbol_tpu.wrappers import RewardNorm

        r = jax.random.normal(key, (64,)) * 2.0
        done = jnp.zeros((64,), bool)
        ref = RewardNorm.init(64).update(r, done)

        mesh = make_mesh()

        @partial(
            jax.shard_map, mesh=mesh,
            in_specs=(Spec("env"), Spec("env")),
            out_specs=RewardNorm(ret=Spec("env"), mean=Spec(),
                                 var=Spec(), count=Spec()),
            check_vma=False,
        )
        def sharded(rr, dd):
            return RewardNorm.init(8).update(rr, dd, axis_name="env")

        got = sharded(r, done)
        np.testing.assert_allclose(
            float(got.var), float(ref.var), rtol=1e-4
        )
        np.testing.assert_allclose(
            np.asarray(got.ret), np.asarray(ref.ret), rtol=1e-6
        )
