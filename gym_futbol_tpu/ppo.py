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
    # Final LR for the linear anneal; only active when make_optimizer is
    # given total_iters (else constant cfg.lr). None (the default) anneals
    # to a 0.1*lr FLOOR rather than 0: the r4 curves showed a linear->0
    # schedule spends the last ~5-10% of every training budget doing no-op
    # updates (pg_loss/approx_kl == 0 at the tail — VERDICT r4 weak #3);
    # a floor keeps late iterations learning. Pass 0.0 explicitly to
    # recover the anneal-to-zero schedule.
    lr_final: float | None = None
    epochs: int = 4
    minibatches: int = 4
    vf_coef: float = 0.5
    ent_coef: float = 0.01
    max_grad_norm: float = 0.5
    # Minibatch shuffling granularity. Row-level random gathers are
    # pathological on TPU (measured 580 ms per minibatch step at 4.2M
    # transitions — 90% of the whole PPO iteration); shuffling contiguous
    # blocks instead gathers whole chunks, which the HBM likes. A block of
    # consecutive flat indices is `shuffle_block` *independent* envs from
    # one (view, timestep), so minibatch statistics are unaffected. In the
    # feature-major buffer a block's obs is F strided runs of
    # 4*shuffle_block bytes — 1024 keeps every gathered run at 4 KB. Set
    # to 1 to recover exact row-level shuffling.
    shuffle_block: int = 1024
    # Rematerialize the policy forward inside the update's backward pass
    # (jax.checkpoint around the per-sample loss core). The update is
    # HBM-bound on stored [mb, hidden] activations (measured r2: 660 ms of
    # a 915 ms iteration at config 5); recomputing them costs ~1/3 more
    # MXU flops and removes almost all activation traffic.
    remat: bool = True


@struct.dataclass
class Transition:
    """One step of experience. Actions are stored BIT-PACKED (3 bits per
    player, one int32 word per action slot) so every leaf of the stacked
    [T, B, ...] trajectory is at most rank-3 with a wide minor dim — a
    [T, B, n_players, 2] int32 buffer puts (n_players, 2) on the tiled
    minor dims and pads ~100x (see models/policy.py docstring).

    STACKED-TRAJECTORY OBS LAYOUTS (update_epochs accepts both, keyed on
    rank): rank-3 ``[T, B, obs_dim]`` row-major (the jnp collect path,
    also consumed whole-batch by a2c), or rank-2 ``[obs_dim, T*B]``
    FEATURE-MAJOR with samples ordered (view, step, env) — the fused
    Pallas collect emits this directly (ops/fused_collect.py docstring),
    and it is the layout the update's MXU matmuls want (samples on the
    lane axis), so the multi-GB buffer is never transposed."""

    obs: jax.Array        # [B, obs_dim] per step; stacked: see above
    dirs: jax.Array       # [B] int32, packed per-player direction indices
    acts: jax.Array       # [B] int32, packed per-player act indices
    logp: jax.Array       # [B]
    value: jax.Array      # [B]
    reward: jax.Array     # [B]
    done: jax.Array       # [B]
    # FROZEN observation-normalization stats (wrappers.RunningNorm) the
    # policy acted through during a normalized FUSED collect — the update
    # must fold the SAME stats into the first layer (fold_obs_norm) so
    # the recomputed log-probs match the behavior policy exactly. None on
    # every un-normalized / jnp path (the jnp path stores normalized obs
    # directly instead).
    norm: Any = None


@struct.dataclass
class RunnerState:
    params: Any
    opt_state: Any
    env_state: EnvState   # batched
    obs: jax.Array        # [B, obs_dim] RAW (un-normalized) observation
    key: jax.Array
    # VecNormalize-equivalent running stats (wrappers.py), carried across
    # iterations when training with --normalize-obs / --normalize-reward
    # (make_normalized_collect). None = off (and an empty pytree node, so
    # specs/checkpoints of un-normalized runners are unchanged).
    obs_norm: Any = None   # wrappers.RunningNorm | None
    rew_norm: Any = None   # wrappers.RewardNorm | None


def make_optimizer(
    cfg: PPOConfig, total_iters: int | None = None
) -> optax.GradientTransformation:
    """Adam with global-norm clipping. When ``total_iters`` is given the
    learning rate anneals linearly from cfg.lr to cfg.lr_final over the
    run's total number of minibatch updates (the usual PPO schedule;
    measurably steadies late training in parity/check_learning.py).
    cfg.lr_final=None (default) means a 0.1*lr floor — see PPOConfig."""
    lr = cfg.lr
    if total_iters:
        lr_final = 0.1 * cfg.lr if cfg.lr_final is None else cfg.lr_final
        lr = optax.linear_schedule(
            cfg.lr, lr_final,
            total_iters * cfg.epochs * cfg.minibatches,
        )
    return optax.chain(
        optax.clip_by_global_norm(cfg.max_grad_norm),
        optax.adam(lr),
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


def make_normalized_collect(
    normalize_obs: bool = True, normalize_reward: bool = True,
    axis_name: str | None = None,
):
    """Collect-fn factory with VecNormalize semantics (SURVEY.md §2.1 #12
    ecosystem; VERDICT r2 item 4): observation z-scoring and/or
    reward-by-return-std scaling THROUGH WHICH the policy actually trains.

    Statistics live in ``runner.obs_norm`` / ``runner.rew_norm``
    (wrappers.RunningNorm/RewardNorm) and are updated inside the rollout
    scan; with ``axis_name`` set (the sharded path) the batch statistics
    are pmean'd so every shard applies ONE global normalizer. Mirroring
    happens on the RAW observation (mirror_obs's x -> 1-x algebra assumes
    field-normalized coordinates, not z-scores); both self-play views are
    then normalized with the same stats — they are identically
    distributed by symmetry. The trajectory stores NORMALIZED obs (what
    the policy saw) and scaled rewards, so the update needs no changes.
    Returns a drop-in for :func:`collect_rollout` (jnp path).
    """

    def collect(
        runner: RunnerState, model: ActorCritic, env_params: EnvParams,
        cfg: PPOConfig,
    ) -> tuple[RunnerState, Transition, jax.Array]:
        assert (not normalize_obs) or runner.obs_norm is not None, (
            "init_runner(..., normalize_obs=True) required"
        )
        assert (not normalize_reward) or runner.rew_norm is not None, (
            "init_runner(..., normalize_reward=True) required"
        )
        b = runner.obs.shape[0]

        def norm_obs2(onorm, obs_raw, update: bool):
            obs2_raw = _both_views(obs_raw, env_params)
            if not normalize_obs:
                return onorm, obs2_raw
            if update:
                onorm = onorm.update(obs2_raw, axis_name=axis_name)
            return onorm, onorm.normalize(obs2_raw)

        def body(carry, _):
            env_state, obs, onorm, rnorm, key = carry
            key, k_act = jax.random.split(key)
            onorm, obs2 = norm_obs2(onorm, obs, update=True)
            logits, value = model.apply(runner.params, obs2)
            action2, logp = sample_actions(k_act, logits)
            joint = jnp.concatenate(
                [action2[:b], env_core.mirror_actions(action2[b:])], axis=1
            )
            env_state, out = step_batch(env_state, joint, env_params)
            r0, r1 = out.team_reward[:, 0], out.team_reward[:, 1]
            if normalize_reward:
                rnorm = rnorm.update(r0, out.done, cfg.gamma,
                                     axis_name=axis_name)
                r0, r1 = rnorm.normalize(r0), rnorm.normalize(r1)
            dirs, acts = pack_actions(action2)
            tr = Transition(
                obs=obs2, dirs=dirs, acts=acts, logp=logp, value=value,
                reward=jnp.concatenate([r0, r1], axis=0),
                done=jnp.concatenate([out.done, out.done], axis=0),
            )
            return (env_state, out.obs, onorm, rnorm, key), tr

        (env_state, obs, onorm, rnorm, key), traj = jax.lax.scan(
            body,
            (runner.env_state, runner.obs, runner.obs_norm,
             runner.rew_norm, runner.key),
            None, length=cfg.rollout_steps,
        )
        # bootstrap value on FROZEN (post-rollout) stats, no update
        _, obs2 = norm_obs2(onorm, obs, update=False)
        _, last_value = model.apply(runner.params, obs2)
        runner = runner.replace(
            env_state=env_state, obs=obs, key=key, obs_norm=onorm,
            rew_norm=rnorm,
        )
        return runner, traj, last_value

    return collect


def _obs_norm_scales(obs_norm, eps: float = 1e-8):
    """(mean, inv_std) of a wrappers.RunningNorm — the affine map
    z = (x - mean) * inv_std that fold_obs_norm bakes into weights.
    NOTE: the folded path applies no +-10 z-clip (RunningNorm.normalize
    does); the env's observations are bounded by construction
    (positions/velocities normalized, flags 0/1), so the clip never
    binds once the variance floor has a few batches behind it."""
    return obs_norm.mean, jax.lax.rsqrt(obs_norm.var + eps)


def fold_obs_norm(w: tuple, mean: jax.Array, inv_std: jax.Array) -> tuple:
    """Fold frozen z-score stats into the FIRST layer of a flat
    kernel-order weight tuple (ops.fused_collect.flatten_actor_critic
    layout: W [in, out], b [out, 1]).

    ``W1' = diag(inv_std) W1,  b1' = b1 - W1'^T mean`` makes the network
    applied to RAW observations compute exactly the original network
    applied to z-scored observations — so the fused collect/update
    kernels, which build raw obs in-kernel / read the raw buffer, train
    THROUGH observation normalization with zero kernel changes and zero
    runtime cost (VERDICT r3 item 6b)."""
    w0, b0 = w[0], w[1]
    w0f = w0 * inv_std[:, None]
    b0f = b0 - (w0f * mean[:, None]).sum(axis=0)[:, None]
    return (w0f, b0f, *w[2:])


def unfold_obs_norm_grads(
    g: tuple, mean: jax.Array, inv_std: jax.Array
) -> tuple:
    """Chain rule back through :func:`fold_obs_norm`: gradients w.r.t.
    the folded (W1', b1') -> gradients w.r.t. the normalized-space
    (W1, b1). dW1 = diag(inv_std) (dW1' - mean dB1'^T), db1 = db1'.
    Exact (certified vs jax.grad in tests/test_ppo.py)."""
    g0, gb0 = g[0], g[1]
    g0_raw = inv_std[:, None] * (g0 - mean[:, None] * gb0.reshape(1, -1))
    return (g0_raw, gb0, *g[2:])


def collect_rollout_fused(
    runner: RunnerState, model: ActorCritic, env_params: EnvParams,
    cfg: PPOConfig, block: int | None = None,
    normalize_obs: bool = False, normalize_reward: bool = False,
    axis_name: str | None = None,
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

    ``normalize_obs``/``normalize_reward`` give this path VecNormalize
    semantics WITHOUT kernel changes (VERDICT r3 item 6b): lagged z-score
    stats are folded into the first Dense layer (:func:`fold_obs_norm` —
    exact), stats update once per iteration from the emitted feature-major
    buffer, rewards are scaled by a post-hoc scan identical to the
    in-loop jnp sequence, and ``traj.norm`` carries the frozen stats for
    :func:`update_epochs_fused` to fold the same way.
    """
    from . import env as env_core
    from .ops import pack_state, unpack_state
    from .ops.fused_collect import flatten_actor_critic, fused_collect

    assert model.n_players == env_params.players_per_team, (
        "self-play PPO trains a per-team policy (see collect_rollout)"
    )
    w = flatten_actor_critic(runner.params, model)
    frozen_norm = None
    if normalize_obs:
        assert runner.obs_norm is not None, (
            "init_runner(..., normalize_obs=True) required"
        )
        # LAGGED stats (updated at the end of the previous iteration)
        # bake into the first layer; the same frozen stats ride the
        # trajectory (traj.norm) so the update recomputes the identical
        # behavior policy.
        frozen_norm = runner.obs_norm
        w = fold_obs_norm(w, *_obs_norm_scales(frozen_norm))
    if normalize_reward:
        assert runner.rew_norm is not None, (
            "init_runner(..., normalize_reward=True) required"
        )
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
    f = obs.shape[1]  # F_pad: feature rows padded to a multiple of 8
    # (zero pad rows; fused_collect docstring) so the fused update's DMA
    # slabs are tile-aligned
    traj = Transition(
        # [2, F, T, nb, 128] -> [F, 2, T*B] -> [F, N]: feature-major with
        # samples ordered (view, step, env) — matches _flatten_tm's order,
        # and moves only two contiguous [F, T*B] chunks (the round-2
        # layout paid a 4-byte-element swapaxes over the whole buffer
        # here; VERDICT r2 item 1a)
        obs=jnp.moveaxis(obs.reshape(2, f, t * b), 0, 1).reshape(
            f, 2 * t * b
        ),
        dirs=dirs.reshape(t, 2 * b),
        acts=acts.reshape(t, 2 * b),
        logp=logp.reshape(t, 2 * b),
        value=value.reshape(t, 2 * b),
        reward=reward.reshape(t, 2 * b),
        done=done.reshape(t, 2 * b).astype(bool),
        norm=frozen_norm,
    )
    obs_norm, rew_norm = runner.obs_norm, runner.rew_norm
    if normalize_obs:
        # fold the RAW buffer's moments into the running stats for the
        # NEXT iteration — one feature-major pass over the [F_pad, N]
        # matrix, never transposed (pad rows excluded). n_feat counts the
        # real obs rows; obs.shape[1] is F_pad.
        n_feat = env_core.obs_size(env_params)
        rows = traj.obs[:n_feat]
        obs_norm = obs_norm.update_moments(
            rows.mean(axis=1), rows.var(axis=1),
            jnp.asarray(rows.shape[1], rows.dtype), axis_name=axis_name,
        )
    if normalize_reward:
        rew_norm, scaled = posthoc_reward_norm(
            rew_norm, traj.reward, traj.done, cfg.gamma, axis_name
        )
        traj = traj.replace(reward=scaled)
    env_state = unpack_state(sf, si, k_state, env_params)
    new_obs = jax.vmap(lambda s: env_core.observe(s, env_params))(env_state)
    runner = runner.replace(
        env_state=env_state, obs=new_obs, key=key, obs_norm=obs_norm,
        rew_norm=rew_norm,
    )
    return runner, traj, last_v.reshape(2 * b)


def posthoc_reward_norm(
    rew_norm, reward: jax.Array, done: jax.Array, gamma: float,
    axis_name: str | None = None,
):
    """VecNormalize reward scaling applied AFTER a fused collect, over the
    emitted [T, 2B] buffers: a scan replaying the IDENTICAL per-step
    update/scale sequence the in-loop jnp path (make_normalized_collect)
    applies — stats follow the team-0 rows, both views scaled with the
    stats-through-step-t (equivalence certified by tests/test_ppo.py).
    Returns (updated RewardNorm, scaled rewards [T, 2B])."""
    b = reward.shape[1] // 2

    def rn_step(rn, rd):
        r, d = rd
        rn = rn.update(r[:b], d[:b], gamma, axis_name=axis_name)
        return rn, jnp.concatenate([rn.normalize(r[:b]), rn.normalize(r[b:])])

    return jax.lax.scan(rn_step, rew_norm, (reward, done))


def make_fused_normalized_collect(
    normalize_obs: bool = True, normalize_reward: bool = True,
    axis_name: str | None = None, block: int | None = None,
):
    """VecNormalize-through-the-Pallas-kernels collect factory — the
    fused twin of :func:`make_normalized_collect`. Returns a drop-in for
    :func:`collect_rollout_fused`; pair with :func:`update_epochs_fused`
    (which reads ``traj.norm``)."""
    return partial(
        collect_rollout_fused, block=block, normalize_obs=normalize_obs,
        normalize_reward=normalize_reward, axis_name=axis_name,
    )


def compute_gae(
    traj: Transition, last_value: jax.Array, cfg: PPOConfig
) -> tuple[jax.Array, jax.Array]:
    """Generalized advantage estimation (reverse scan). Returns
    (advantages [T,B], returns [T,B]). Scans only the [T, B] fields it
    needs — traj.obs may be the feature-major [F, N] matrix (fused
    collect path) whose leading axis differs from T."""
    gamma = cfg.gamma
    lam = cfg.gae_lambda

    def body(carry, vrd):
        value, reward, done = vrd
        gae, next_value = carry
        nonterminal = 1.0 - done.astype(value.dtype)
        delta = reward + gamma * next_value * nonterminal - value
        gae = delta + gamma * lam * nonterminal * gae
        return (gae, value), gae

    (_, _), adv = jax.lax.scan(
        body, (jnp.zeros_like(last_value), last_value),
        (traj.value, traj.reward, traj.done), reverse=True,
    )
    return adv, adv + traj.value


def _forward_fm(params, model: ActorCritic, obs_fm: jax.Array):
    """ActorCritic forward on a FEATURE-MAJOR [F, S] obs matrix.

    Same weights/math as ``model.apply`` (certified by
    tests/test_ppo.py::test_feature_major_forward_matches_apply), but
    every Dense is a ``dot_general`` contracting the feature axis with
    samples staying on the minor (lane) axis — the MXU-friendly
    orientation; the row-major apply on [S, F] puts the 46-feature axis
    on lanes and forces XLA to relayout. Returns (logit rows [G*5, S],
    value [S])."""
    dense = params["params"]
    x = obs_fm.astype(model.dtype)
    n_hidden = len(model.hidden)
    contract = (((0,), (0,)), ((), ()))
    for i in range(n_hidden):
        layer = dense[f"Dense_{i}"]
        kern = layer["kernel"]
        if i == 0 and x.shape[0] > kern.shape[0]:
            # fused-collect obs rows are zero-padded to a multiple of 8;
            # pad the first layer's weights to match (exact: 0 * pad)
            kern = jnp.pad(kern,
                           ((0, x.shape[0] - kern.shape[0]), (0, 0)))
        x = jnp.tanh(
            jax.lax.dot_general(kern, x, contract)
            + layer["bias"][:, None]
        )
    head_l = dense[f"Dense_{n_hidden}"]
    head_v = dense[f"Dense_{n_hidden + 1}"]
    logits = (
        jax.lax.dot_general(head_l["kernel"], x, contract)
        + head_l["bias"][:, None]
    )
    value = (
        jax.lax.dot_general(head_v["kernel"], x, contract)
        + head_v["bias"][:, None]
    )[0]
    return logits, value


def _logp_entropy_rows(
    logit_rows: jax.Array, dirs_packed: jax.Array, acts_packed: jax.Array
) -> tuple[jax.Array, jax.Array]:
    """Row-form joint log-prob + entropy from [G*5, S] logit rows (the
    feature-major twin of models.policy.action_log_prob_and_entropy_packed
    — same math, but the logits are already rows so there is no
    moveaxis)."""
    from .models.policy import N_CHOICES, _log_softmax_rows

    g5 = logit_rows.shape[0]
    assert g5 % N_CHOICES == 0
    logp_total, ent_total = None, None
    for g in range(g5 // N_CHOICES):
        rows = [logit_rows[g * N_CHOICES + i] for i in range(N_CHOICES)]
        p, slot = g // 2, g % 2
        packed = dirs_packed if slot == 0 else acts_packed
        a = (packed >> (3 * p)) & 7
        logp, exps, z = _log_softmax_rows(rows)
        taken = logp[0]
        ent = -exps[0] * logp[0]
        for i in range(1, N_CHOICES):
            taken = jnp.where(a == i, logp[i], taken)
            ent = ent - exps[i] * logp[i]
        ent = ent / z
        logp_total = taken if logp_total is None else logp_total + taken
        ent_total = ent if ent_total is None else ent_total + ent
    return logp_total, ent_total


def _loss_core(params, model: ActorCritic, obs_fm, dirs, acts):
    """The per-sample recomputable core of the PPO loss: forward + taken
    log-prob + entropy + value. Wrapped in jax.checkpoint when
    ``cfg.remat`` so its [hidden, S] activations are recomputed in the
    backward pass instead of round-tripping through HBM."""
    logit_rows, value = _forward_fm(params, model, obs_fm)
    logp, entropy = _logp_entropy_rows(logit_rows, dirs, acts)
    return logp, entropy, value


def ppo_loss(
    params, model: ActorCritic, obs_fm: jax.Array, dirs: jax.Array,
    acts: jax.Array, logp_old: jax.Array, value_old: jax.Array,
    adv: jax.Array, returns: jax.Array, cfg: PPOConfig,
) -> tuple[jax.Array, dict[str, jax.Array]]:
    """Clipped-surrogate PPO loss over one FEATURE-MAJOR minibatch:
    ``obs_fm`` is [F, S]; every other array is [S]."""
    if cfg.remat:
        core = jax.checkpoint(
            lambda p, o, d, a: _loss_core(p, model, o, d, a)
        )
        logp, entropy, value = core(params, obs_fm, dirs, acts)
    else:
        logp, entropy, value = _loss_core(params, model, obs_fm, dirs, acts)
    ratio = jnp.exp(logp - logp_old)

    norm_adv = (adv - adv.mean()) / (adv.std() + 1e-8)
    pg1 = ratio * norm_adv
    pg2 = jnp.clip(ratio, 1.0 - cfg.clip_eps, 1.0 + cfg.clip_eps) * norm_adv
    pg_loss = -jnp.minimum(pg1, pg2).mean()

    v_clipped = value_old + jnp.clip(
        value - value_old, -cfg.clip_eps, cfg.clip_eps
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


def _flatten_tm(x: jax.Array) -> jax.Array:
    """[T, 2B] time-major self-play field -> [N] flat samples ordered
    (view, step, env) — the fused collect's feature-major obs column
    order (ops/fused_collect.py docstring). Moves contiguous [B] rows."""
    t, b2 = x.shape
    return jnp.moveaxis(x.reshape(t, 2, b2 // 2), 1, 0).reshape(t * b2)


def _obs_to_fm(obs3: jax.Array) -> jax.Array:
    """Row-major stacked obs [T, 2B, F] (jnp collect path) -> the
    feature-major [F, N] matrix in _flatten_tm's sample order."""
    t, b2, f = obs3.shape
    return jnp.transpose(
        obs3.reshape(t, 2, b2 // 2, f), (3, 1, 0, 2)
    ).reshape(f, t * b2)


def _shuffle_block_for(n: int, cfg: PPOConfig) -> int:
    """Largest divisor of ``n`` that is <= cfg.shuffle_block and leaves at
    least cfg.minibatches blocks. Degrading granularity (1024 -> 512 ->
    ... -> 128) keeps the gather chunky; only a pathological buffer size
    ever reaches the row-level (block=1) shuffle that was measured at
    580 ms/minibatch (ADVICE r3 item 2). ``n`` is static at trace time."""
    b = min(cfg.shuffle_block, n // max(cfg.minibatches, 1))
    while b > 1 and n % b:
        b -= 1
    return max(b, 1)


def update_epochs(
    params, opt_state, traj: Transition, adv, returns,
    key: jax.Array, model: ActorCritic, tx, cfg: PPOConfig,
    axis_name: str | None = None,
):
    """cfg.epochs x cfg.minibatches SGD steps over the flattened buffer.

    The buffer is consumed FEATURE-MAJOR: ``traj.obs`` is kept (or
    converted once, if the collect path produced row-major rank-3 obs) as
    an [F, N] matrix so the minibatch forward/backward matmuls contract
    the feature axis with samples on the lane axis, and the fused
    collect's multi-GB buffer never gets transposed (VERDICT r2 item 1).

    When ``axis_name`` is set (shard_map path), gradients and metrics are
    pmean'd across that mesh axis — the one collective on the training
    path (SURVEY.md §2.3).
    """
    assert traj.norm is None, (
        "a normalized FUSED trajectory (traj.norm set, raw obs buffer) "
        "must be consumed by update_epochs_fused, which folds the frozen "
        "stats into the weights; this XLA path would train on raw obs"
    )
    t, b2 = traj.reward.shape
    n = t * b2
    obs_fm = traj.obs if traj.obs.ndim == 2 else _obs_to_fm(traj.obs)
    assert obs_fm.shape[1] == n, (
        f"feature-major obs has {obs_fm.shape[1]} samples, buffer has {n}"
    )
    flat_fields = {
        "dirs": traj.dirs, "acts": traj.acts, "logp": traj.logp,
        "value": traj.value, "adv": adv, "ret": returns,
    }
    flat_fields = {k: _flatten_tm(v) for k, v in flat_fields.items()}
    # Block-granular shuffle (see PPOConfig.shuffle_block): reshape the
    # flat sample axis to [n_blocks, block] so the per-epoch permutation
    # gathers whole contiguous chunks instead of single samples. When the
    # buffer size doesn't divide by cfg.shuffle_block (or would leave
    # fewer than `minibatches` blocks — empty minibatches, NaN loss), the
    # granularity DEGRADES to the largest dividing block instead of
    # collapsing to the pathological row-level gather.
    block = _shuffle_block_for(n, cfg)
    n_blocks = n // block
    f_dim = obs_fm.shape[0]
    obs_blk = obs_fm.reshape(f_dim, n_blocks, block)
    flat = {k: v.reshape(n_blocks, block) for k, v in flat_fields.items()}
    mb_blocks = n_blocks // cfg.minibatches
    mb_size = mb_blocks * block

    def epoch(carry, k):
        params, opt_state = carry
        perm = jax.random.permutation(k, n_blocks)

        def minibatch(carry, idx):
            params, opt_state = carry
            take = lambda x: jnp.take(x, idx, axis=0).reshape(mb_size)
            f = {k: take(v) for k, v in flat.items()}
            mb_obs = jnp.take(obs_blk, idx, axis=1).reshape(f_dim, mb_size)
            grads, metrics = jax.grad(ppo_loss, has_aux=True)(
                params, model, mb_obs, f["dirs"], f["acts"], f["logp"],
                f["value"], f["adv"], f["ret"], cfg
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


def update_epochs_fused(
    params, opt_state, traj: Transition, adv, returns,
    key: jax.Array, model: ActorCritic, tx, cfg: PPOConfig,
    axis_name: str | None = None, interpret: bool = False,
    compute_dtype=None,
):
    """Drop-in for :func:`update_epochs` on the Pallas fused-update
    kernel (ops/fused_update.py): each minibatch's forward + backward
    runs as ONE kernel over VMEM-resident sample blocks, with the
    per-epoch shuffle permutation applied by scalar-prefetch index maps
    (no gathered minibatch copy, no HBM activation round-trips). Same
    loss math as :func:`ppo_loss` — certified by
    tests/test_ops.py::TestFusedUpdate and parity/check_fused_update.py.

    Requires the feature-major [F, N] trajectory obs (the fused collect's
    native layout) with N a multiple of cfg.shuffle_block; TPU only
    (interpret=True runs the interpreter, for tests).
    """
    from .ops.fused_collect import flatten_actor_critic
    from .ops.fused_update import fused_minibatch_grad, unflatten_actor_critic

    t, b2 = traj.reward.shape
    n = t * b2
    assert traj.obs.ndim == 2 and traj.obs.shape[1] == n, (
        "update_epochs_fused needs the feature-major [F, N] obs layout "
        "(collect_rollout_fused); use update_epochs for row-major obs"
    )
    block = cfg.shuffle_block
    assert n % block == 0 and (n // block) >= cfg.minibatches, (
        f"buffer of {n} samples needs a multiple of shuffle_block={block} "
        f"with at least {cfg.minibatches} blocks"
    )
    n_blocks = n // block
    obs_fm = traj.obs
    flat = {
        "dirs": traj.dirs, "acts": traj.acts, "logp": traj.logp,
        "value": traj.value, "adv": adv, "ret": returns,
    }
    flat = {k: _flatten_tm(v).reshape(n_blocks, block)
            for k, v in flat.items()}
    mb_blocks = n_blocks // cfg.minibatches
    n_torso = len(model.hidden)
    # Normalized fused collect: the obs buffer is RAW; fold the SAME
    # frozen stats the behavior policy acted through into the first
    # layer for every forward/backward, and chain the gradient back
    # (exact — see fold_obs_norm). The [F_pad] pad rows of the buffer
    # are zero and the folded pad weights are zero, so padding inside
    # fused_minibatch_grad stays exact.
    norm_scales = (
        _obs_norm_scales(traj.norm) if traj.norm is not None else None
    )

    def epoch(carry, k):
        params, opt_state = carry
        perm = jax.random.permutation(k, n_blocks)

        def minibatch(carry, idx):
            params, opt_state = carry
            adv_mb = jnp.take(flat["adv"], idx, axis=0)
            adv_n = (adv_mb - adv_mb.mean()) / (adv_mb.std() + 1e-8)
            w = flatten_actor_critic(params, model)
            if norm_scales is not None:
                w = fold_obs_norm(w, *norm_scales)
            kw = {} if compute_dtype is None else {
                "compute_dtype": compute_dtype
            }
            grads_flat, msums = fused_minibatch_grad(
                w, obs_fm, flat["dirs"], flat["acts"], flat["logp"],
                flat["value"], flat["ret"], adv_n, idx,
                n_torso=n_torso, clip_eps=cfg.clip_eps,
                vf_coef=cfg.vf_coef, ent_coef=cfg.ent_coef, block=block,
                interpret=interpret, **kw,
            )
            if norm_scales is not None:
                grads_flat = unfold_obs_norm_grads(grads_flat, *norm_scales)
            grads = unflatten_actor_critic(grads_flat, model)
            inv_m = 1.0 / (mb_blocks * block)
            metrics = {k: v * inv_m for k, v in msums.items()}
            metrics["loss"] = (
                metrics["pg_loss"] + cfg.vf_coef * metrics["v_loss"]
                - cfg.ent_coef * metrics["entropy"]
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
    collect_fn=None, update_fn=None,
) -> tuple[RunnerState, dict[str, jax.Array]]:
    """One full PPO iteration: rollout -> GAE -> epochs of updates.

    Pure and jittable; this is the unit that gets jit'd/shard_map'd by
    :mod:`gym_futbol_tpu.parallel` and by ``train.py``. ``collect_fn``
    defaults to the jnp :func:`collect_rollout`; pass
    :func:`collect_rollout_fused` for the Pallas kernel path (TPU only).
    ``update_fn`` defaults to :func:`update_epochs`; pass
    :func:`update_epochs_fused` for the Pallas fused-update kernel.
    """
    collect_fn = collect_fn or collect_rollout
    update_fn = update_fn or update_epochs
    runner, traj, last_value = collect_fn(runner, model, env_params, cfg)
    adv, returns = compute_gae(traj, last_value, cfg)
    key, k_update = jax.random.split(runner.key)
    params, opt_state, metrics = update_fn(
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
    normalize_obs: bool = False, normalize_reward: bool = False,
) -> RunnerState:
    from .vector import reset_batch

    k_params, k_env, k_run = jax.random.split(key, 3)
    dummy = jnp.zeros((1, env_core.obs_size(env_params)), model.dtype)
    params = model.init(k_params, dummy)
    opt_state = tx.init(params)
    env_state, obs = reset_batch(k_env, env_params, n_envs)
    obs_norm = rew_norm = None
    if normalize_obs:
        from .wrappers import RunningNorm

        obs_norm = RunningNorm.init(env_core.obs_size(env_params))
    if normalize_reward:
        from .wrappers import RewardNorm

        rew_norm = RewardNorm.init(n_envs)
    return RunnerState(
        params=params, opt_state=opt_state, env_state=env_state, obs=obs,
        key=k_run, obs_norm=obs_norm, rew_norm=rew_norm,
    )
