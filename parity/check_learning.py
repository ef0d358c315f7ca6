"""End-to-end LEARNING gate (VERDICT r1 item 2): a short self-play PPO
run on the real chip must produce a policy that beats a random opponent.

This is the product claim of an RL framework — metrics flowing and loss
decreasing are necessary but not sufficient; this gate trains 2v2 PPO
for a few minutes and requires ``evaluate(trained vs random)`` to report
``win_rate_a >= --win-threshold`` (default 0.6).

Run (TPU):  python parity/check_learning.py
Options:    --iters N --envs B --win-threshold W --jnp-collect

The trained-vs-random evaluation plays the trained policy as team 0 and
uniform-random actions as team 1 over full episodes; win = more goals.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

from gym_futbol_tpu import EnvParams  # noqa: E402
from gym_futbol_tpu.evaluate import evaluate  # noqa: E402
from gym_futbol_tpu.models.policy import ActorCritic, make_policy_fn  # noqa: E402
from gym_futbol_tpu.ppo import (  # noqa: E402
    PPOConfig,
    collect_rollout,
    collect_rollout_fused,
    init_runner,
    make_optimizer,
    train_iteration,
)
from gym_futbol_tpu.utils.cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=150)
    ap.add_argument("--envs", type=int, default=8192)
    ap.add_argument("--rollout-steps", type=int, default=128)
    ap.add_argument("--hidden", type=int, nargs="+", default=[128, 128])
    ap.add_argument("--lr", type=float, default=3e-4)
    ap.add_argument("--ent-coef", type=float, default=0.01)
    ap.add_argument("--win-threshold", type=float, default=0.6)
    ap.add_argument("--eval-envs", type=int, default=512)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--jnp-collect", action="store_true",
                    help="use the jit+vmap collect instead of the Pallas "
                         "fused-collect kernel (e.g. on CPU)")
    ap.add_argument("--log-every", type=int, default=10)
    args = ap.parse_args()

    env_params = EnvParams(players_per_team=2)
    cfg = PPOConfig(
        rollout_steps=args.rollout_steps, lr=args.lr, ent_coef=args.ent_coef,
    )
    model = ActorCritic(
        n_players=env_params.players_per_team, hidden=tuple(args.hidden)
    )
    tx = make_optimizer(cfg)
    runner = init_runner(
        jax.random.PRNGKey(args.seed), model, env_params, cfg,
        n_envs=args.envs, tx=tx,
    )
    collect_fn = collect_rollout if args.jnp_collect else collect_rollout_fused
    step = jax.jit(
        lambda r: train_iteration(
            r, model, env_params, cfg, tx, collect_fn=collect_fn
        )
    )

    t0 = time.perf_counter()
    for it in range(args.iters):
        runner, metrics = step(runner)
        if it % args.log_every == 0 or it == args.iters - 1:
            m = {k: round(float(v), 5) for k, v in metrics.items()}
            print(f"# iter {it:4d}  {json.dumps(m)}", flush=True)
    train_s = time.perf_counter() - t0
    total_steps = args.iters * args.envs * cfg.rollout_steps

    policy = make_policy_fn(model, runner.params)
    res = evaluate(
        env_params, policy_a=policy, n_envs=args.eval_envs,
        n_steps=env_params.max_steps, seed=args.seed + 1,
    )
    res = {k: (v.tolist() if hasattr(v, "tolist") else v)
           for k, v in res.items()}
    print(f"# trained-vs-random: {json.dumps(res)}")

    win = float(res["win_rate_a"])
    ok = win >= args.win_threshold
    print(json.dumps({
        "metric": "trained_vs_random_win_rate",
        "value": round(win, 4),
        "unit": f"win rate over {args.eval_envs} matches",
        "threshold": args.win_threshold,
        "ok": ok,
        "train_env_steps": total_steps,
        "train_seconds": round(train_s, 1),
        "goals_per_episode": res["goals_per_episode"],
    }))
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
