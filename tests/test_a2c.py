"""A2C learner: loss math, single-device iteration, sharded iteration."""

import jax
import jax.numpy as jnp
import numpy as np

from gym_futbol_tpu import EnvParams
from gym_futbol_tpu import a2c
from gym_futbol_tpu.models.policy import ActorCritic
from gym_futbol_tpu.parallel import (
    make_mesh,
    shard_env_state,
    shard_train_iteration,
)

P = EnvParams(players_per_team=1, substeps=2, solver_iterations=3, max_steps=32)
CFG = a2c.A2CConfig(rollout_steps=4)


def _setup(n_envs=16):
    model = ActorCritic(n_players=P.players_per_team, hidden=(32,))
    tx = a2c.make_optimizer(CFG)
    runner = a2c.init_runner(
        jax.random.PRNGKey(0), model, P, CFG, n_envs=n_envs, tx=tx
    )
    return model, tx, runner


class TestA2C:
    def test_iteration_runs_and_updates(self, key):
        model, tx, runner = _setup()
        step = jax.jit(
            lambda r: a2c.train_iteration(r, model, P, CFG, tx)
        )
        r2, metrics = step(runner)
        assert np.isfinite(float(metrics["loss"]))
        assert np.isfinite(float(metrics["mean_reward"]))
        # params actually changed
        leaves0 = jax.tree.leaves(runner.params)
        leaves1 = jax.tree.leaves(r2.params)
        assert any(
            not np.allclose(np.asarray(a), np.asarray(b))
            for a, b in zip(leaves0, leaves1)
        )

    def test_loss_gradient_direction(self):
        """Positive-advantage actions get more probable after one step on a
        fixed batch (policy-gradient sign check)."""
        model, tx, runner = _setup()
        runner, traj, last_v = a2c.collect_rollout(runner, model, P, CFG)
        adv, ret = a2c.compute_gae(traj, last_v, CFG)
        n = traj.reward.shape[0] * traj.reward.shape[1]
        flat = jax.tree.map(lambda x: x.reshape((n,) + x.shape[2:]), traj)
        adv_pos = jnp.ones((n,))  # force positive advantage everywhere
        grads, _ = jax.grad(a2c.a2c_loss, has_aux=True)(
            runner.params, model, flat, adv_pos, ret.reshape(n), CFG
        )
        updates, _ = tx.update(grads, tx.init(runner.params), runner.params)
        import optax
        new_params = optax.apply_updates(runner.params, updates)

        from gym_futbol_tpu.models.policy import (
            action_log_prob_and_entropy_packed,
        )
        logits0, _ = model.apply(runner.params, flat.obs)
        logits1, _ = model.apply(new_params, flat.obs)
        lp0, _ = action_log_prob_and_entropy_packed(logits0, flat.dirs, flat.acts)
        lp1, _ = action_log_prob_and_entropy_packed(logits1, flat.dirs, flat.acts)
        assert float((lp1 - lp0).mean()) > 0.0

    def test_sharded_iteration(self, key):
        model, tx, runner = _setup(n_envs=16)
        mesh = make_mesh()
        runner = runner.replace(env_state=shard_env_state(runner.env_state, mesh))
        step = shard_train_iteration(
            mesh, model, P, CFG, tx, iteration_fn=a2c.train_iteration
        )
        r2, metrics = step(runner)
        assert np.isfinite(float(metrics["loss"]))
        # params stay replicated across shards
        p0 = jax.tree.leaves(r2.params)[0]
        assert p0.sharding.is_fully_replicated


class TestA2CFeatureMajor:
    def test_fm_loss_matches_row_major(self, key):
        """a2c_loss_fm on the fused-collect layout (feature-major obs,
        (view, step, env)-ordered samples) must equal a2c_loss on the
        row-major trajectory — loss AND gradients (VERDICT r3 item 6a)."""
        from gym_futbol_tpu.ppo import _flatten_tm, _obs_to_fm

        model, tx, runner = _setup()
        runner, traj, last_v = a2c.collect_rollout(runner, model, P, CFG)
        adv, ret = a2c.compute_gae(traj, last_v, CFG)

        n = traj.reward.shape[0] * traj.reward.shape[1]
        flat = jax.tree.map(lambda x: x.reshape((n,) + x.shape[2:]), traj)
        ref_loss, ref_grads = jax.value_and_grad(
            lambda p: a2c.a2c_loss(p, model, flat, adv.reshape(n),
                                   ret.reshape(n), CFG)[0]
        )(runner.params)

        got_loss, got_grads = jax.value_and_grad(
            lambda p: a2c.a2c_loss_fm(
                p, model, _obs_to_fm(traj.obs), _flatten_tm(traj.dirs),
                _flatten_tm(traj.acts), _flatten_tm(adv),
                _flatten_tm(ret), CFG,
            )[0]
        )(runner.params)
        np.testing.assert_allclose(float(got_loss), float(ref_loss),
                                   rtol=1e-5)
        for a, b in zip(jax.tree.leaves(got_grads),
                        jax.tree.leaves(ref_grads)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-6)

    def test_iteration_with_fm_trajectory(self, key):
        """a2c.train_iteration consumes a feature-major trajectory (the
        fused-collect shape) end to end: fake the collect by converting a
        jnp rollout to the kernel's layout."""
        from gym_futbol_tpu.ppo import _obs_to_fm, collect_rollout

        model, tx, runner = _setup()

        def fm_collect(runner, model, env_params, cfg):
            runner, traj, last_v = collect_rollout(
                runner, model, env_params, cfg
            )
            return runner, traj.replace(obs=_obs_to_fm(traj.obs)), last_v

        step = jax.jit(lambda r: a2c.train_iteration(
            r, model, P, CFG, tx, collect_fn=fm_collect
        ))
        r2, metrics = step(runner)
        assert np.isfinite(float(metrics["loss"]))
        assert any(
            not np.allclose(np.asarray(a), np.asarray(b))
            for a, b in zip(jax.tree.leaves(runner.params),
                            jax.tree.leaves(r2.params))
        )
