"""Debug tooling promised by SURVEY.md §5 (sanitizers row): the
``jax_debug_nans`` toggle catches NaN-producing programs, and
``chex.assert_max_traces`` guards the hot functions against accidental
retrace explosions (the pure-functional analog of a sanitizer)."""

import chex
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gym_futbol_tpu import EnvParams
from gym_futbol_tpu import env as env_core
from gym_futbol_tpu.vector import reset_batch, step_batch

P = EnvParams(players_per_team=1, substeps=2, solver_iterations=3,
              max_steps=8)


class TestDebugNans:
    def test_env_step_clean_under_debug_nans(self, key):
        """The whole env step runs NaN-free with jax_debug_nans armed
        (the toggle train.py --debug-nans flips)."""
        with jax.debug_nans(True):
            state, obs = reset_batch(key, P, 8)
            a = jax.random.randint(key, (8, P.n_players, 2), 0, 5,
                                   dtype=jnp.int32)
            for _ in range(3):
                state, out = step_batch(state, a, P)
            assert np.isfinite(np.asarray(out.reward)).all()

    def test_debug_nans_actually_fires(self):
        """Sanity: the toggle detects a NaN-producing program."""
        with jax.debug_nans(True):
            with pytest.raises(FloatingPointError):
                jax.jit(lambda x: 0.0 / x)(jnp.asarray(0.0)).block_until_ready()


class TestMaxTraces:
    def test_env_step_traces_once(self, key):
        """Repeated same-shape calls must reuse one trace — a retrace
        explosion here would silently wreck throughput."""
        chex.clear_trace_counter()

        @jax.jit
        @chex.assert_max_traces(n=1)
        def step1(s, a):
            return env_core.step(s, a, P, auto_reset=True)

        state, _ = env_core.reset(key, P)
        a = jnp.zeros((P.n_players, 2), jnp.int32)
        for _ in range(4):
            state, out = step1(state, a)
        assert np.isfinite(float(out.reward))

    def test_train_iteration_traces_once(self, key):
        from gym_futbol_tpu.models.policy import ActorCritic
        from gym_futbol_tpu.ppo import (
            PPOConfig, init_runner, make_optimizer, train_iteration,
        )

        chex.clear_trace_counter()
        cfg = PPOConfig(rollout_steps=4, epochs=1, minibatches=2)
        model = ActorCritic(n_players=P.players_per_team, hidden=(16,))
        tx = make_optimizer(cfg)
        runner = init_runner(key, model, P, cfg, n_envs=8, tx=tx)

        @jax.jit
        @chex.assert_max_traces(n=1)
        def it(r):
            return train_iteration(r, model, P, cfg, tx)

        for _ in range(3):
            runner, metrics = it(runner)
        assert np.isfinite(float(metrics["loss"]))
