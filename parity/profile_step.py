"""Component-level throughput breakdown on the local accelerator.

Times, at a given batch size, 256-step scans of:
  physics   — physics_step only
  step      — vmap'd env.step (no auto-reset)
  autoreset — step_batch (step + auto-reset select)
  rollout   — full bench path (random policy + step_batch)

Usage: python parity/profile_step.py [--envs 4096] [--ppt 2]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from gym_futbol_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

from gym_futbol_tpu import EnvParams
from gym_futbol_tpu import env as env_core
from gym_futbol_tpu.physics import physics_step
from gym_futbol_tpu.vector import random_policy, reset_batch, rollout, step_batch


def bench_scan(name: str, fn, carry, n_steps: int, b: int) -> None:
    """fn(carry) -> carry; time a lax.scan of n_steps."""

    @jax.jit
    def run(carry):
        def body(c, _):
            return fn(c), None

        out, _ = jax.lax.scan(body, carry, None, length=n_steps)
        return out

    t0 = time.perf_counter()
    out = run(carry)
    jax.block_until_ready(out)
    compile_s = time.perf_counter() - t0
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        out = run(carry)
        jax.block_until_ready(out)
        times.append(time.perf_counter() - t0)
    best = min(times)
    print(f"{name:10s}: {b * n_steps / best / 1e6:8.2f} M env-steps/s "
          f"(compile {compile_s:.0f}s, run {best * 1e3:.1f}ms)")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--envs", type=int, default=4096)
    ap.add_argument("--ppt", type=int, default=2)
    ap.add_argument("--steps", type=int, default=256)
    args = ap.parse_args()

    params = EnvParams(players_per_team=args.ppt)
    b, t = args.envs, args.steps
    key = jax.random.PRNGKey(0)
    state, obs = reset_batch(key, params, b)
    actions = jnp.zeros((b, params.n_players, 2), jnp.int32)

    # physics only (batch-minor: [n_bodies, 2, B])
    forces = jnp.zeros((params.n_bodies, 2, b), jnp.float32)
    pv = (state.pos, state.vel)
    bench_scan(
        "physics",
        lambda pv: jax.vmap(
            lambda p, v, f: physics_step(p, v, f, params),
            in_axes=-1, out_axes=-1,
        )(pv[0], pv[1], forces),
        pv, t, b,
    )

    # env step without auto-reset
    from gym_futbol_tpu.vector import STATE_AXES

    bench_scan(
        "step",
        lambda s: jax.vmap(
            lambda ss, a: env_core.step(ss, a, params),
            in_axes=(STATE_AXES, 0), out_axes=(STATE_AXES, 0),
        )(s, actions)[0],
        state, t, b,
    )

    # step + auto-reset
    bench_scan(
        "autoreset",
        lambda s: step_batch(s, actions, params)[0],
        state, t, b,
    )

    # full rollout path (policy RNG + step + auto-reset)
    policy = random_policy(params)

    @jax.jit
    def full(state, key):
        return rollout(state, policy, key, params, t)

    t0 = time.perf_counter()
    out = full(state, jax.random.PRNGKey(1))
    jax.block_until_ready(out)
    compile_s = time.perf_counter() - t0
    times = []
    for i in range(3):
        t0 = time.perf_counter()
        out = full(state, jax.random.PRNGKey(2 + i))
        jax.block_until_ready(out)
        times.append(time.perf_counter() - t0)
    print(f"{'rollout':10s}: {b * t / min(times) / 1e6:8.2f} M env-steps/s "
          f"(compile {compile_s:.0f}s, run {min(times) * 1e3:.1f}ms)")


if __name__ == "__main__":
    main()
