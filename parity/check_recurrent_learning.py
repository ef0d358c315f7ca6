"""Recurrent learning gate (VERDICT r2 item 8): LSTM A2C must beat a
random opponent at 1v1 after a few minutes of on-chip self-play.

Trains ``RecurrentActorCritic`` with full-batch BPTT A2C
(a2c.train_iteration_recurrent — the stable-baselines MlpLstmPolicy
analog, SURVEY.md §3.5) and evaluates with the carry-threading
evaluator (evaluate.evaluate_recurrent). Gate: trained-vs-random
win rate >= --win-threshold (default 0.80; measured 0.973 on the v5e
after 161 s / 197M env-steps — the recurrent path has no fused kernels;
this is a learning certification, not a throughput one).

Run (TPU, ~4 min):  python parity/check_recurrent_learning.py
CPU smoke:          python parity/check_recurrent_learning.py \
                        --iters 3 --envs 8 --eval-envs 8 --win-threshold 0
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
from gym_futbol_tpu import a2c  # noqa: E402
from gym_futbol_tpu.evaluate import evaluate_recurrent  # noqa: E402
from gym_futbol_tpu.models.recurrent import RecurrentActorCritic  # noqa: E402
from gym_futbol_tpu.utils.cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=3000)
    ap.add_argument("--envs", type=int, default=4096)
    ap.add_argument("--rollout-steps", type=int, default=16)
    ap.add_argument("--lstm-size", type=int, default=128)
    ap.add_argument("--hidden", type=int, nargs="+", default=[128])
    ap.add_argument("--lr", type=float, default=7e-4)
    ap.add_argument("--win-threshold", type=float, default=0.80)
    ap.add_argument("--eval-envs", type=int, default=2048)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--log-every", type=int, default=200)
    args = ap.parse_args()

    env_params = EnvParams(players_per_team=1)
    cfg = a2c.A2CConfig(rollout_steps=args.rollout_steps, lr=args.lr)
    model = RecurrentActorCritic(
        n_players=env_params.players_per_team, hidden=tuple(args.hidden),
        lstm_size=args.lstm_size,
    )
    tx = a2c.make_optimizer(cfg)
    runner = a2c.init_recurrent_runner(
        jax.random.PRNGKey(args.seed), model, env_params, cfg,
        n_envs=args.envs, tx=tx,
    )
    step_fn = jax.jit(
        lambda r: a2c.train_iteration_recurrent(r, model, env_params, cfg, tx)
    )

    t0 = time.perf_counter()
    for it in range(args.iters):
        runner, metrics = step_fn(runner)
        if it % args.log_every == 0 or it == args.iters - 1:
            m = {k: round(float(v), 5) for k, v in metrics.items()}
            print(f"# iter {it:5d}  {json.dumps(m)}", flush=True)
    train_s = time.perf_counter() - t0
    steps = args.iters * args.envs * cfg.rollout_steps

    res = evaluate_recurrent(
        env_params, model, runner.params, n_envs=args.eval_envs,
        n_steps=env_params.max_steps, seed=args.seed + 7,
    )
    win = float(res["win_rate_a"])
    ok = win >= args.win_threshold
    print(json.dumps({
        "metric": "recurrent_trained_vs_random_win_rate",
        "value": round(win, 4),
        "unit": f"win rate over {args.eval_envs} matches (1v1 LSTM A2C)",
        "threshold": args.win_threshold,
        "ok": ok,
        "goals_per_episode": [round(float(g), 3)
                              for g in res["goals_per_episode"]],
        "train_env_steps": steps,
        "train_seconds": round(train_s, 1),
    }))
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
