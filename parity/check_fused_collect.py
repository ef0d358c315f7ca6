"""Fused-collect kernel internal consistency vs the flax model.

The kernel emits (obs, packed actions, logp, value). Feeding its OWN obs
back through the flax ActorCritic with the SAME weights must reproduce:

- value exactly (deterministic function of obs) to f32 roundoff;
- logp of the emitted actions (action_log_prob_and_entropy_packed)
  likewise — this certifies the in-kernel obs assembly, MLP, sampling
  bookkeeping and bit-packing all agree with the learner's view, which is
  what the PPO ratio depends on.

Also sanity-checks GAE inputs (done/reward ranges). TPU only.

Run:  python parity/check_fused_collect.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from gym_futbol_tpu import EnvParams  # noqa: E402
from gym_futbol_tpu.env import obs_size  # noqa: E402
from gym_futbol_tpu.models.policy import (  # noqa: E402
    ActorCritic,
    action_log_prob_and_entropy_packed,
)
from gym_futbol_tpu.ppo import (  # noqa: E402
    PPOConfig,
    collect_rollout_fused,
    init_runner,
    make_optimizer,
)
from gym_futbol_tpu.utils.cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()


def main() -> int:
    from gym_futbol_tpu.env import mirror_obs  # noqa: E402

    env_params = EnvParams(players_per_team=2)
    cfg = PPOConfig(rollout_steps=32)
    model = ActorCritic(n_players=env_params.players_per_team)
    tx = make_optimizer(cfg)
    n_envs = 2048
    runner = init_runner(
        jax.random.PRNGKey(0), model, env_params, cfg, n_envs=n_envs, tx=tx
    )
    runner, traj, last_v = jax.jit(
        lambda r: collect_rollout_fused(r, model, env_params, cfg)
    )(runner)

    t, b2 = traj.reward.shape
    assert b2 == 2 * n_envs, "self-play buffer: both perspectives"
    n = t * b2
    # obs is feature-major [F, N], columns ordered (view, step, env) —
    # the SAME flat order ppo._flatten_tm gives the packed actions, so
    # the row-major flax apply on obs.T must reproduce the kernel's own
    # logp/value sample-for-sample.
    from gym_futbol_tpu.ppo import _flatten_tm, _forward_fm, _logp_entropy_rows

    f_real = obs_size(env_params)
    # fused collect pads feature rows to a multiple of 8 with zeros
    pad_rows = traj.obs[f_real:]
    assert float(jnp.abs(pad_rows).max()) == 0.0, "obs pad rows not zero"
    flat_obs = traj.obs[:f_real].T  # [N, F]
    logits, value = model.apply(runner.params, flat_obs)
    logp, ent = action_log_prob_and_entropy_packed(
        logits, _flatten_tm(traj.dirs), _flatten_tm(traj.acts)
    )

    v_err = float(jnp.abs(value - _flatten_tm(traj.value)).max())
    lp_err = float(jnp.abs(logp - _flatten_tm(traj.logp)).max())
    print(f"value err (kernel vs flax): {v_err:.3e}")
    print(f"logp err  (kernel vs flax): {lp_err:.3e}")

    # the feature-major update forward (ppo._forward_fm) must agree with
    # the row-major flax apply on the same trained weights — this is the
    # exact pair (kernel collect -> fm update) the config-5 path runs.
    fm_logits, fm_value = _forward_fm(runner.params, model, traj.obs)
    fm_logp, _ = _logp_entropy_rows(
        fm_logits, _flatten_tm(traj.dirs), _flatten_tm(traj.acts)
    )
    fm_v_err = float(jnp.abs(fm_value - value).max())
    fm_lp_err = float(jnp.abs(fm_logp - logp).max())
    print(f"fm-update forward vs flax: value {fm_v_err:.3e} "
          f"logp {fm_lp_err:.3e}")

    # the kernel's mirrored (team-1) view must equal env.mirror_obs of its
    # team-0 view — certifies the in-kernel _obs_matrix(mirror=True).
    # Columns are view-major: the first N/2 are view 0.
    obs_a = traj.obs[:f_real, : n // 2].T
    obs_b = traj.obs[:f_real, n // 2:].T
    mir_err = float(jnp.abs(mirror_obs(obs_a, env_params) - obs_b).max())
    print(f"mirror err (kernel view 1 vs env.mirror_obs): {mir_err:.3e}")

    done = np.asarray(traj.done)
    rew = np.asarray(traj.reward)
    # logp (what the PPO ratio depends on) must match tightly — measured
    # bit-exact. value tolerates the platform's default bf16 matmul
    # precision: BOTH the kernel and flax deviate from an f64 ground
    # truth by ~4e-3 here (verified), they just round differently.
    ok = v_err < 5e-3 and lp_err < 1e-5 and mir_err < 1e-6
    ok &= fm_v_err < 5e-3 and fm_lp_err < 1e-4
    ok &= bool(np.isfinite(rew).all())
    ok &= set(np.unique(done)) <= {False, True}
    # the two perspectives' rewards genuinely differ (not r0 twice)
    ok &= bool(np.abs(rew[:, :n_envs] - rew[:, n_envs:]).max() > 1e-4)
    # both halves' dones agree (same envs)
    ok &= bool((done[:, :n_envs] == done[:, n_envs:]).all())
    # actions decode to the valid range (per-team packing)
    for p in range(env_params.players_per_team):
        d = (np.asarray(traj.dirs) >> (3 * p)) & 7
        a = (np.asarray(traj.acts) >> (3 * p)) & 7
        ok &= bool((d < 5).all() and (a < 5).all())
    print("OK" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
