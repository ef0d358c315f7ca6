"""A2C learner, fully on-device.

The reference's training scripts use stable-baselines ``PPO2``/``A2C``
(SURVEY.md §2.1 #12, §3.5). :mod:`gym_futbol_tpu.ppo` covers PPO; this
module is the synchronous advantage actor-critic companion: one shared
self-play rollout (reused from ppo.collect_rollout — per-team policy,
both perspectives in the buffer), n-step/GAE targets, and a SINGLE
full-batch gradient step per iteration — no clipping, no minibatch
epochs. Classic A2C uses RMSProp (the stable-baselines
default); :func:`make_optimizer` follows that.

Like PPO, the whole iteration is one pure jittable function, and the
sharded path reuses :func:`gym_futbol_tpu.parallel.shard_iteration`
with gradients pmean'd over the 'env' mesh axis.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import optax

from .models.policy import ActorCritic, action_log_prob_and_entropy_packed
from .ppo import RunnerState, collect_rollout, compute_gae, init_runner
from .types import EnvParams


@dataclasses.dataclass(frozen=True)
class A2CConfig:
    rollout_steps: int = 8
    gamma: float = 0.99
    gae_lambda: float = 1.0      # 1.0 => plain n-step advantage (classic A2C)
    lr: float = 7e-4
    vf_coef: float = 0.5
    ent_coef: float = 0.01
    max_grad_norm: float = 0.5
    rms_decay: float = 0.99
    rms_eps: float = 1e-5


def make_optimizer(cfg: A2CConfig) -> optax.GradientTransformation:
    """RMSProp, the stable-baselines A2C default."""
    return optax.chain(
        optax.clip_by_global_norm(cfg.max_grad_norm),
        optax.rmsprop(cfg.lr, decay=cfg.rms_decay, eps=cfg.rms_eps),
    )


def a2c_loss(
    params, model: ActorCritic, traj, adv: jax.Array, returns: jax.Array,
    cfg: A2CConfig,
) -> tuple[jax.Array, dict[str, jax.Array]]:
    """Vanilla actor-critic loss on the full [T*B] batch."""
    logits, value = model.apply(params, traj.obs)
    logp, entropy = action_log_prob_and_entropy_packed(
        logits, traj.dirs, traj.acts
    )
    pg_loss = -(jax.lax.stop_gradient(adv) * logp).mean()
    v_loss = 0.5 * ((value - returns) ** 2).mean()
    ent = entropy.mean()
    total = pg_loss + cfg.vf_coef * v_loss - cfg.ent_coef * ent
    return total, {
        "loss": total,
        "pg_loss": pg_loss,
        "v_loss": v_loss,
        "entropy": ent,
    }


def train_iteration(
    runner: RunnerState, model: ActorCritic, env_params: EnvParams,
    cfg: A2CConfig, tx, axis_name: str | None = None,
) -> tuple[RunnerState, dict[str, jax.Array]]:
    """One A2C iteration: rollout -> advantages -> one gradient step.

    Pure and jittable; drop-in signature-compatible with
    :func:`gym_futbol_tpu.ppo.train_iteration` so the sharding layer and
    the training CLI treat both algorithms uniformly.
    """
    runner, traj, last_value = collect_rollout(runner, model, env_params, cfg)
    adv, returns = compute_gae(traj, last_value, cfg)

    n = traj.reward.shape[0] * traj.reward.shape[1]
    flat = jax.tree.map(lambda x: x.reshape((n,) + x.shape[2:]), traj)
    grads, metrics = jax.grad(a2c_loss, has_aux=True)(
        runner.params, model, flat, adv.reshape(n), returns.reshape(n), cfg
    )
    if axis_name is not None:
        grads = jax.lax.pmean(grads, axis_name)
        metrics = jax.lax.pmean(metrics, axis_name)
    updates, opt_state = tx.update(grads, runner.opt_state, runner.params)
    params = optax.apply_updates(runner.params, updates)

    # team-0 perspective rows only (self-play buffer layout; see ppo.py)
    metrics["mean_reward"] = traj.reward[
        :, : traj.reward.shape[1] // 2
    ].mean()
    if axis_name is not None:
        metrics["mean_reward"] = jax.lax.pmean(metrics["mean_reward"], axis_name)
    return runner.replace(params=params, opt_state=opt_state), metrics


__all__ = [
    "A2CConfig",
    "RunnerState",
    "a2c_loss",
    "init_runner",
    "make_optimizer",
    "train_iteration",
]
