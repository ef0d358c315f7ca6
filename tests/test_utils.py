"""Checkpoint round-trip, metrics writer, profiling helpers (SURVEY.md §5)."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from gym_futbol_tpu import EnvParams
from gym_futbol_tpu.models.policy import ActorCritic
from gym_futbol_tpu.ppo import PPOConfig, init_runner, make_optimizer
from gym_futbol_tpu.utils.checkpoint import Checkpointer
from gym_futbol_tpu.utils.metrics import MetricsLogger
from gym_futbol_tpu.utils.profiling import cost_analysis, timed


class TestCheckpoint:
    def test_runner_roundtrip(self, key, tmp_path):
        p = EnvParams(players_per_team=1, max_steps=10)
        cfg = PPOConfig(rollout_steps=4, minibatches=2)
        model = ActorCritic(n_players=p.players_per_team, hidden=(16,))
        tx = make_optimizer(cfg)
        runner = init_runner(key, model, p, cfg, n_envs=4, tx=tx)

        ck = Checkpointer(str(tmp_path / "ckpt"))
        ck.save(runner, step=7)
        ck.wait()

        restored, step = ck.restore_latest(runner)
        assert step == 7
        jax.tree.map(
            lambda a, b: np.testing.assert_array_equal(
                np.asarray(a), np.asarray(b)
            ),
            runner, restored,
        )

    def test_restore_empty_dir(self, key, tmp_path):
        ck = Checkpointer(str(tmp_path / "none"))
        restored, step = ck.restore_latest({"x": jnp.zeros(3)})
        assert restored is None and step == 0


class TestMetrics:
    def test_jsonl_written(self, tmp_path):
        log = MetricsLogger(str(tmp_path), tensorboard=False)
        rec = log.write(3, {"loss": jnp.asarray(1.5), "n": 2})
        log.close()
        assert rec["loss"] == 1.5
        lines = open(os.path.join(tmp_path, "metrics.jsonl")).readlines()
        parsed = json.loads(lines[-1])
        assert parsed["step"] == 3 and parsed["loss"] == 1.5

    def test_no_directory_is_noop(self):
        log = MetricsLogger(None)
        rec = log.write(0, {"a": 1.0})
        assert rec["a"] == 1.0
        log.close()


class TestProfiling:
    def test_timed(self):
        x = jnp.ones((8, 8))
        with timed("matmul", sync=x) as t:
            y = x @ x
        assert t["seconds"] is not None and t["seconds"] >= 0

    def test_cost_analysis_has_flops(self):
        out = cost_analysis(lambda a: a @ a, jnp.ones((64, 64)))
        assert isinstance(out, dict)
