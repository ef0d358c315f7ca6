"""Phase-by-phase wall-clock breakdown of one full PPO iteration at a
given config (default: BASELINE config 5 — 5v5, 65536 envs, T=128).

Times, with a device_get sync after each phase:
  collect   — fused_collect kernel + buffer re-layout (Transition build)
  gae       — compute_gae reverse scan
  update    — update_epochs (epochs x minibatches SGD)
  full      — the whole jitted train_iteration for comparison

Usage:  python parity/profile_ppo.py [--envs 65536] [--ppt 5] [--steps 128]
        [--precision default|bfloat16|bfloat16_3x|float32]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from gym_futbol_tpu import EnvParams
from gym_futbol_tpu.models.policy import ActorCritic
from gym_futbol_tpu.ppo import (
    PPOConfig, collect_rollout_fused, compute_gae, init_runner,
    make_optimizer, train_iteration, update_epochs,
)
from gym_futbol_tpu.utils.cache import enable_compilation_cache


def timed(label, fn, *args, iters=3, **kw):
    out = fn(*args, **kw)
    jax.device_get(jax.tree.leaves(out)[0])
    out = fn(*args, **kw)  # second warmup: re-specialization pass
    jax.device_get(jax.tree.leaves(out)[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args, **kw)
    jax.device_get(jax.tree.leaves(out)[0])
    dt = (time.perf_counter() - t0) / iters
    print(f"{label:>10}: {dt * 1e3:9.1f} ms")
    return out, dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--envs", type=int, default=65536)
    ap.add_argument("--ppt", type=int, default=5)
    ap.add_argument("--steps", type=int, default=128)
    ap.add_argument("--precision", default=None,
                    choices=("default", "bfloat16", "bfloat16_3x", "float32"))
    args = ap.parse_args()
    enable_compilation_cache()
    if args.precision and args.precision != "default":
        jax.config.update("jax_default_matmul_precision", args.precision)

    env_params = EnvParams(players_per_team=args.ppt)
    cfg = PPOConfig(rollout_steps=args.steps)
    model = ActorCritic(n_players=env_params.players_per_team)
    tx = make_optimizer(cfg)
    runner = init_runner(
        jax.random.PRNGKey(0), model, env_params, cfg, n_envs=args.envs,
        tx=tx,
    )

    collect = jax.jit(lambda r: collect_rollout_fused(r, model, env_params, cfg))
    (runner, traj, last_v), t_col = timed("collect", collect, runner)

    gae = jax.jit(lambda tr, lv: compute_gae(tr, lv, cfg))
    (adv, ret), t_gae = timed("gae", gae, traj, last_v)

    upd = jax.jit(
        lambda p, o, tr, a, r, k: update_epochs(
            p, o, tr, a, r, k, model, tx, cfg
        )
    )
    _, t_upd = timed(
        "update", upd, runner.params, runner.opt_state, traj, adv, ret,
        jax.random.PRNGKey(1),
    )

    # free the phase buffers before the full-iteration run — the 5v5
    # 65536-env trajectory is ~3.5 GB and a full iteration allocates its
    # own copy; holding both OOMs the 16 GB HBM.
    del traj, adv, ret, last_v
    import gc
    gc.collect()

    full = jax.jit(
        lambda r: train_iteration(
            r, model, env_params, cfg, tx, collect_fn=collect_rollout_fused
        )
    )
    _, t_full = timed("full", full, runner)
    n = args.envs * args.steps
    print(f"  phases sum: {(t_col + t_gae + t_upd) * 1e3:.1f} ms; "
          f"full iteration: {t_full * 1e3:.1f} ms "
          f"-> {n / t_full / 1e6:.2f}M env-steps/s")


if __name__ == "__main__":
    main()
