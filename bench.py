"""Throughput benchmark — BASELINE.md config 3 (headline metric).

2v2 FutbolEnv, 4096-env batch with auto-reset, random policy, full
rollout under jit+lax.scan on the local accelerator. Prints exactly ONE
JSON line:

    {"metric": "env_steps_per_sec", "value": N, "unit": "steps/s",
     "vs_baseline": R}

``vs_baseline`` is value / 1,000,000 — the driver's north-star target of
>=1M env-steps/s per v5e chip (BASELINE.json). The reference publishes no
benchmark numbers (BASELINE.md: `published: {}`), so the target is the
operative baseline.

Usage: python bench.py [--envs 4096] [--steps 512] [--ppt 2] [--iters 3]
"""

from __future__ import annotations

import argparse
import json
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--envs", type=int, default=4096)
    ap.add_argument("--steps", type=int, default=512)
    ap.add_argument("--ppt", type=int, default=2)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--verbose", action="store_true")
    args = ap.parse_args()

    import jax

    from gym_futbol_tpu import EnvParams
    from gym_futbol_tpu.parallel import make_mesh, shard_env_state, shard_rollout
    from gym_futbol_tpu.vector import reset_batch

    params = EnvParams(players_per_team=args.ppt)
    mesh = make_mesh()
    run = shard_rollout(mesh, params, args.steps)

    key = jax.random.PRNGKey(0)
    state, _ = reset_batch(key, params, args.envs)
    state = shard_env_state(state, mesh)

    # warmup / compile
    t0 = time.perf_counter()
    state, outs = run(state, jax.random.PRNGKey(1))
    jax.block_until_ready(outs.reward)
    compile_s = time.perf_counter() - t0
    if args.verbose:
        print(f"# compile+first-run: {compile_s:.1f}s on {jax.devices()[0]}")

    times = []
    for i in range(args.iters):
        t0 = time.perf_counter()
        state, outs = run(state, jax.random.PRNGKey(2 + i))
        jax.block_until_ready(outs.reward)
        times.append(time.perf_counter() - t0)

    best = min(times)
    steps_per_sec = args.envs * args.steps / best
    print(
        json.dumps(
            {
                "metric": "env_steps_per_sec",
                "value": round(steps_per_sec),
                "unit": "steps/s",
                "vs_baseline": round(steps_per_sec / 1_000_000, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
