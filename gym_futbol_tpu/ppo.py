"""PPO learner, fully on-device (BASELINE.json configs 4-5).

The reference's training story is stable-baselines ``PPO2`` over a Python
rollout loop (SURVEY.md §3.5) — host-bound, single process, one agent
controlling one side. Here the whole iteration (rollout with lax.scan ->
GAE -> minibatched clipped-surrogate epochs) is one jittable pure function
over the batched env, so it runs as a single XLA program per iteration and
shards over the ``env`` mesh axis (see :mod:`gym_futbol_tpu.parallel`):
trajectories stay device-local, the only collective is the gradient/metric
reduction (SURVEY.md §2.3).

TRAINING SETUP: symmetric SELF-PLAY with one shared per-team policy. The
env is two-sided; the learner controls team 0 directly and team 1 through
the mirrored observation (env.mirror_obs / env.mirror_actions), and BOTH
perspectives' transitions — each with its own team's reward — fill the
buffer (2x samples per env-step at one env's cost). This matches the
reference's one-agent-one-side semantics (SURVEY.md §3.5) while staying
fully batched; a single joint policy rewarded only on team 0 would learn
to make team 1 concede.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
import optax
from flax import struct

from . import env as env_core
from .models.policy import (
    ActorCritic,
    action_log_prob_and_entropy_packed,
    pack_actions,
    sample_actions,
)
from .types import EnvParams, EnvState
from .vector import step_batch


@dataclasses.dataclass(frozen=True)
class PPOConfig:
    rollout_steps: int = 128
    gamma: float = 0.99
    gae_lambda: float = 0.95
    clip_eps: float = 0.2
    lr: float = 3e-4
    epochs: int = 4
    minibatches: int = 4
    vf_coef: float = 0.5
    ent_coef: float = 0.01
    max_grad_norm: float = 0.5
    # Minibatch shuffling granularity. Row-level random gathers are
    # pathological on TPU (measured 580 ms per minibatch step at 4.2M
    # transitions — 90% of the whole PPO iteration); shuffling contiguous
    # blocks instead gathers ~20 KB rows, which the HBM likes. A block of
    # consecutive flat indices is one timestep of `shuffle_block`
    # *independent* envs, so minibatch statistics are unaffected. Set to 1
    # to recover exact row-level shuffling.
    shuffle_block: int = 128


@struct.dataclass
class Transition:
    """One step of experience. Actions are stored BIT-PACKED (3 bits per
    player, one int32 word per action slot) so every leaf of the stacked
    [T, B, ...] trajectory is at most rank-3 with a wide minor dim — a
    [T, B, n_players, 2] int32 buffer puts (n_players, 2) on the tiled
    minor dims and pads ~100x (see models/policy.py docstring)."""

    obs: jax.Array        # [B, obs_dim]
    dirs: jax.Array       # [B] int32, packed per-player direction indices
    acts: jax.Array       # [B] int32, packed per-player act indices
    logp: jax.Array       # [B]
    value: jax.Array      # [B]
    reward: jax.Array     # [B]
    done: jax.Array       # [B]


@struct.dataclass
class RunnerState:
    params: Any
    opt_state: Any
    env_state: EnvState   # batched
    obs: jax.Array        # [B, obs_dim]
    key: jax.Array


def make_optimizer(cfg: PPOConfig) -> optax.GradientTransformation:
    return optax.chain(
        optax.clip_by_global_norm(cfg.max_grad_norm),
        optax.adam(cfg.lr),
    )


def _both_views(obs: jax.Array, env_params: EnvParams) -> jax.Array:
    """[B, F] world obs -> [2B, F]: rows [:B] are the team-0 view, rows
    [B:] the team-1 view (env.mirror_obs)."""
    return jnp.concatenate([obs, env_core.mirror_obs(obs, env_params)], axis=0)


def collect_rollout(
    runner: RunnerState, model: ActorCritic, env_params: EnvParams,
    cfg: PPOConfig,
) -> tuple[RunnerState, Transition, jax.Array]:
    """T steps of SELF-PLAY experience via lax.scan.

    ``model`` is a per-TEAM policy (``model.n_players ==
    env_params.players_per_team``). Each step it is applied to the true
    observation (team-0 view) and to the mirrored observation (team-1
    view, :func:`env.mirror_obs`); the two action sets drive BOTH teams
    of the same envs, and BOTH perspectives' transitions enter the buffer
    — team k's rows carry team k's own reward (``out.team_reward[:, k]``),
    so the shared policy improves each side from its own signal instead of
    teaching team 1 to concede. Returns (runner, traj [T, 2B, ...],
    bootstrap value [2B]); rows [:B] are team 0's perspective, rows [B:]
    team 1's in its mirrored frame (actions/logp consistent with the
    mirrored logits).
    """
    assert model.n_players == env_params.players_per_team, (
        f"self-play PPO trains a per-team policy: model.n_players="
        f"{model.n_players} must equal players_per_team="
        f"{env_params.players_per_team}"
    )
    b = runner.obs.shape[0]

    def body(carry, _):
        env_state, obs, key = carry
        key, k_act = jax.random.split(key)
        obs2 = _both_views(obs, env_params)
        logits, value = model.apply(runner.params, obs2)
        action2, logp = sample_actions(k_act, logits)   # [2B, ppt, 2]
        joint = jnp.concatenate(
            [action2[:b], env_core.mirror_actions(action2[b:])], axis=1
        )
        env_state, out = step_batch(env_state, joint, env_params)
        dirs, acts = pack_actions(action2)
        tr = Transition(
            obs=obs2, dirs=dirs, acts=acts, logp=logp, value=value,
            reward=jnp.concatenate(
                [out.team_reward[:, 0], out.team_reward[:, 1]], axis=0
            ),
            done=jnp.concatenate([out.done, out.done], axis=0),
        )
        return (env_state, out.obs, key), tr

    (env_state, obs, key), traj = jax.lax.scan(
        body, (runner.env_state, runner.obs, runner.key), None,
        length=cfg.rollout_steps,
    )
    _, last_value = model.apply(runner.params, _both_views(obs, env_params))
    runner = runner.replace(env_state=env_state, obs=obs, key=key)
    return runner, traj, last_value


def collect_rollout_fused(
    runner: RunnerState, model: ActorCritic, env_params: EnvParams,
    cfg: PPOConfig, block: int | None = None,
) -> tuple[RunnerState, Transition, jax.Array]:
    """Drop-in for :func:`collect_rollout` on the Pallas fused-collect
    kernel (ops/fused_collect.py): BOTH views' per-team policy forward
    (MXU), sampling (on-core PRNG), env step and auto-reset all run in
    ONE kernel; the trajectory buffer is emitted directly in the
    perspective layout the self-play update consumes ([T, 2B, ...], rows
    [:B] team 0's view, [B:] team 1's mirrored view).

    TPU only. The action-sampling RNG stream differs from the jnp path
    (core PRNG vs jax.random) — same distribution, and logp/value are the
    kernel's own outputs for its own actions, so the on-policy contract
    holds (certified by parity/check_fused_collect.py).
    """
    from . import env as env_core
    from .ops import pack_state, unpack_state
    from .ops.fused_collect import flatten_actor_critic, fused_collect

    assert model.n_players == env_params.players_per_team, (
        "self-play PPO trains a per-team policy (see collect_rollout)"
    )
    w = flatten_actor_critic(runner.params, model)
    sf, si = pack_state(runner.env_state, env_params)
    if block is None:
        # The kernel streams all per-step trajectory rows to HBM, so VMEM
        # holds only state + weights + step scratches and the block size
        # is independent of T. Mosaic needs the sublane dim (block//128)
        # to be a multiple of 8 — i.e. block a multiple of 1024 — or the
        # whole per-shard array; pick the largest dividing candidate.
        b_shard = sf.shape[1] * 128
        block = b_shard
        for cand in (2048, 1024):
            if b_shard % cand == 0:
                block = cand
                break
    key, k_seed, k_state = jax.random.split(runner.key, 3)
    seed = jax.random.randint(k_seed, (1,), 0, 2**31 - 1, dtype=jnp.int32)
    (sf, si, obs, dirs, acts, logp, value, reward, done,
     last_v) = fused_collect(
        sf, si, w, seed, env_params, cfg.rollout_steps, block=block
    )
    t, b = cfg.rollout_steps, sf.shape[1] * 128
    f = env_core.obs_size(env_params)
    traj = Transition(
        # [T, 2, F, nb, 128] -> [T, 2, B, F] -> [T, 2B, F]
        obs=jnp.swapaxes(obs.reshape(t, 2, f, b), 2, 3).reshape(t, 2 * b, f),
        dirs=dirs.reshape(t, 2 * b),
        acts=acts.reshape(t, 2 * b),
        logp=logp.reshape(t, 2 * b),
        value=value.reshape(t, 2 * b),
        reward=reward.reshape(t, 2 * b),
        done=done.reshape(t, 2 * b).astype(bool),
    )
    env_state = unpack_state(sf, si, k_state, env_params)
    new_obs = jax.vmap(lambda s: env_core.observe(s, env_params))(env_state)
    runner = runner.replace(env_state=env_state, obs=new_obs, key=key)
    return runner, traj, last_v.reshape(2 * b)


def compute_gae(
    traj: Transition, last_value: jax.Array, cfg: PPOConfig
) -> tuple[jax.Array, jax.Array]:
    """Generalized advantage estimation (reverse scan). Returns
    (advantages [T,B], returns [T,B])."""
    gamma = cfg.gamma
    lam = cfg.gae_lambda

    def body(carry, tr):
        gae, next_value = carry
        nonterminal = 1.0 - tr.done.astype(tr.value.dtype)
        delta = tr.reward + gamma * next_value * nonterminal - tr.value
        gae = delta + gamma * lam * nonterminal * gae
        return (gae, tr.value), gae

    (_, _), adv = jax.lax.scan(
        body, (jnp.zeros_like(last_value), last_value), traj, reverse=True
    )
    return adv, adv + traj.value


def ppo_loss(
    params, model: ActorCritic, batch: Transition, adv: jax.Array,
    returns: jax.Array, cfg: PPOConfig,
) -> tuple[jax.Array, dict[str, jax.Array]]:
    logits, value = model.apply(params, batch.obs)
    logp, entropy = action_log_prob_and_entropy_packed(
        logits, batch.dirs, batch.acts
    )
    ratio = jnp.exp(logp - batch.logp)

    norm_adv = (adv - adv.mean()) / (adv.std() + 1e-8)
    pg1 = ratio * norm_adv
    pg2 = jnp.clip(ratio, 1.0 - cfg.clip_eps, 1.0 + cfg.clip_eps) * norm_adv
    pg_loss = -jnp.minimum(pg1, pg2).mean()

    v_clipped = batch.value + jnp.clip(
        value - batch.value, -cfg.clip_eps, cfg.clip_eps
    )
    v_loss = 0.5 * jnp.maximum(
        (value - returns) ** 2, (v_clipped - returns) ** 2
    ).mean()
    ent = entropy.mean()

    total = pg_loss + cfg.vf_coef * v_loss - cfg.ent_coef * ent
    metrics = {
        "loss": total,
        "pg_loss": pg_loss,
        "v_loss": v_loss,
        "entropy": ent,
        "approx_kl": ((ratio - 1) - jnp.log(ratio)).mean(),
    }
    return total, metrics


def update_epochs(
    params, opt_state, traj: Transition, adv, returns,
    key: jax.Array, model: ActorCritic, tx, cfg: PPOConfig,
    axis_name: str | None = None,
):
    """cfg.epochs x cfg.minibatches SGD steps over the flattened buffer.

    When ``axis_name`` is set (shard_map path), gradients and metrics are
    pmean'd across that mesh axis — the one collective on the training
    path (SURVEY.md §2.3).
    """
    t, b = traj.reward.shape
    n = t * b
    # Block-granular shuffle (see PPOConfig.shuffle_block): reshape the
    # flat buffer to [n_blocks, block, ...] so the per-epoch permutation
    # gathers whole contiguous blocks instead of single rows.
    # Fall back to row-level shuffling when the buffer is too small for
    # block granularity: with n // block < minibatches the per-minibatch
    # block count would round to zero and every minibatch would be empty
    # (NaN loss, silent no-op update).
    block = (
        cfg.shuffle_block
        if n % cfg.shuffle_block == 0
        and n // cfg.shuffle_block >= cfg.minibatches
        else 1
    )
    n_blocks = n // block
    flat = jax.tree.map(
        lambda x: x.reshape((n_blocks, block) + x.shape[2:]), traj
    )
    flat_adv = adv.reshape(n_blocks, block)
    flat_ret = returns.reshape(n_blocks, block)
    mb_blocks = n_blocks // cfg.minibatches
    mb_size = mb_blocks * block

    def epoch(carry, k):
        params, opt_state = carry
        perm = jax.random.permutation(k, n_blocks)

        def minibatch(carry, idx):
            params, opt_state = carry
            take = lambda x: jnp.take(x, idx, axis=0).reshape(
                (mb_size,) + x.shape[2:]
            )
            mb = jax.tree.map(take, flat)
            grads, metrics = jax.grad(ppo_loss, has_aux=True)(
                params, model, mb, take(flat_adv), take(flat_ret), cfg
            )
            if axis_name is not None:
                grads = jax.lax.pmean(grads, axis_name)
                metrics = jax.lax.pmean(metrics, axis_name)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state), metrics

        idxs = perm[: cfg.minibatches * mb_blocks].reshape(
            cfg.minibatches, mb_blocks
        )
        (params, opt_state), metrics = jax.lax.scan(
            minibatch, (params, opt_state), idxs
        )
        return (params, opt_state), metrics

    keys = jax.random.split(key, cfg.epochs)
    (params, opt_state), metrics = jax.lax.scan(
        epoch, (params, opt_state), keys
    )
    return params, opt_state, jax.tree.map(lambda m: m.mean(), metrics)


def train_iteration(
    runner: RunnerState, model: ActorCritic, env_params: EnvParams,
    cfg: PPOConfig, tx, axis_name: str | None = None,
    collect_fn=None,
) -> tuple[RunnerState, dict[str, jax.Array]]:
    """One full PPO iteration: rollout -> GAE -> epochs of updates.

    Pure and jittable; this is the unit that gets jit'd/shard_map'd by
    :mod:`gym_futbol_tpu.parallel` and by ``train.py``. ``collect_fn``
    defaults to the jnp :func:`collect_rollout`; pass
    :func:`collect_rollout_fused` for the Pallas kernel path (TPU only).
    """
    collect_fn = collect_fn or collect_rollout
    runner, traj, last_value = collect_fn(runner, model, env_params, cfg)
    adv, returns = compute_gae(traj, last_value, cfg)
    key, k_update = jax.random.split(runner.key)
    params, opt_state, metrics = update_epochs(
        runner.params, runner.opt_state, traj, adv, returns, k_update,
        model, tx, cfg, axis_name,
    )
    # traj rows [:B] are team 0's perspective, [B:] team 1's; report the
    # team-0 view so the metric is comparable with evaluate().
    metrics["mean_reward"] = traj.reward[
        :, : traj.reward.shape[1] // 2
    ].mean()
    if axis_name is not None:
        metrics["mean_reward"] = jax.lax.pmean(metrics["mean_reward"], axis_name)
    runner = runner.replace(params=params, opt_state=opt_state, key=key)
    return runner, metrics


def init_runner(
    key: jax.Array, model: ActorCritic, env_params: EnvParams,
    cfg: PPOConfig, n_envs: int, tx,
) -> RunnerState:
    from .vector import reset_batch

    k_params, k_env, k_run = jax.random.split(key, 3)
    dummy = jnp.zeros((1, env_core.obs_size(env_params)), model.dtype)
    params = model.init(k_params, dummy)
    opt_state = tx.init(params)
    env_state, obs = reset_batch(k_env, env_params, n_envs)
    return RunnerState(
        params=params, opt_state=opt_state, env_state=env_state, obs=obs,
        key=k_run,
    )
