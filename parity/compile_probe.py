"""Incremental compile-time probe: which piece of the bench program makes
the (remote) TPU compiler slow? Compiles progressively bigger programs and
prints wall times. Run with a generous timeout."""

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
from gym_futbol_tpu.vector import STATE_AXES, random_policy, reset_batch, rollout, step_batch


def clock(name, fn, *args):
    t0 = time.perf_counter()
    out = fn(*args)
    jax.block_until_ready(out)
    print(f"{name}: {time.perf_counter() - t0:.1f}s", flush=True)
    return out


def main():
    params = EnvParams(players_per_team=2)
    b = 4096
    state, obs = clock("reset_batch", lambda: reset_batch(jax.random.PRNGKey(0), params, b))

    actions = jnp.zeros((b, params.n_players, 2), jnp.int32)

    # 1. single batched step (no scan)
    step1 = jax.jit(lambda s, a: step_batch(s, a, params))
    state2, out = clock("step_batch x1", step1, state, actions)

    # 2. scan of 16 steps
    @jax.jit
    def scan16(state):
        def body(s, _):
            s, o = step_batch(s, actions, params)
            return s, o.reward
        return jax.lax.scan(body, state, None, length=16)

    clock("scan16", scan16, state)

    # 3. rollout with policy RNG, 16 steps
    pol = random_policy(params)

    @jax.jit
    def roll16(state, key):
        return rollout(state, pol, key, params, 16)

    clock("rollout16", roll16, state, jax.random.PRNGKey(1))

    # 4. rollout 512 steps (the bench program, sans mesh constraint)
    @jax.jit
    def roll512(state, key):
        return rollout(state, pol, key, params, 512)

    clock("rollout512", roll512, state, jax.random.PRNGKey(1))

    # timed second run
    t0 = time.perf_counter()
    out = roll512(state, jax.random.PRNGKey(2))
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    print(f"rollout512 run: {dt*1e3:.1f}ms = {b*512/dt/1e6:.2f} M steps/s", flush=True)


if __name__ == "__main__":
    main()
