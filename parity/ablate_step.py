"""In-scan ablation profiler: where does the fused step's time go?

Per-stage dispatch timing is useless here (axon remote-execute RTT
dominates any <1ms program), so instead each ablation compiles a full
64-step lax.scan rollout with ONE stage stubbed out and compares
steady-state time/step against the full program. The difference is that
stage's true marginal cost inside the fused program (fusion effects
included, which is what actually matters).

Run on the real chip:  python parity/ablate_step.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from gym_futbol_tpu import game
from gym_futbol_tpu import env as env_core
from gym_futbol_tpu.physics import physics_step
from gym_futbol_tpu.types import EnvParams, EnvState
from gym_futbol_tpu.utils.cache import enable_compilation_cache
from gym_futbol_tpu.vector import reset_batch

enable_compilation_cache()

B = 4096
T = 64
PPT = 2


def make_step(params: EnvParams, ablate: str):
    """env.step(auto_reset=True) clone with one stage stubbed."""

    def step(state: EnvState, actions: jax.Array):
        dtype = state.pos.dtype
        if ablate == "rng_splits":
            k_kick = k_kickoff = k_next = state.key
        else:
            k_kick, k_kickoff, k_next = jax.random.split(state.key, 3)
        pos_before = state.pos

        forces = game.decode_forces(actions, params, dtype)
        if ablate == "possession":
            possession = state.possession
        else:
            possession = game.update_possession(
                state.pos, state.possession, actions, params
            )
        if ablate == "kick":
            vel = state.vel
        else:
            vel, possession = game.apply_kick(
                state.pos, state.vel, possession, actions, k_kick, params
            )

        if ablate == "physics":
            dt = jnp.asarray(params.dt, dtype)
            pos, vel = state.pos + vel * dt, vel
        else:
            pos, vel = physics_step(state.pos, vel, forces, params)
        if ablate != "dribble":
            pos, vel = game.apply_dribble(pos, vel, possession, actions, params)

        goals = game.detect_goal(pos, params)
        pos, vel, ball_clamped = game.clamp_oob(pos, vel, params)

        if ablate == "rewards":
            team_reward = jnp.zeros((2,), dtype)
        else:
            team_reward = game.shaped_rewards(
                pos_before, pos, possession, goals, ball_clamped, params
            )

        any_goal = jnp.any(goals)
        if ablate == "kickoff":
            kick_pos = jnp.full((params.n_bodies, 2), 100.0, dtype)
            kick_vel = jnp.zeros_like(kick_pos)
        else:
            kick_pos, kick_vel = game.kickoff_positions(k_kickoff, params, dtype)
        pos = jnp.where(any_goal, kick_pos, pos)
        vel = jnp.where(any_goal, kick_vel, vel)
        possession = jnp.where(any_goal, jnp.asarray(-1, jnp.int32), possession)
        score = state.score + goals.astype(jnp.int32)

        t = state.t + 1
        done = t >= params.max_steps

        new_state = EnvState(
            pos=jnp.where(done, kick_pos, pos),
            vel=jnp.where(done, kick_vel, vel),
            possession=jnp.where(done, jnp.asarray(-1, jnp.int32), possession),
            score=jnp.where(done, jnp.zeros((2,), jnp.int32), score),
            t=jnp.where(done, jnp.asarray(0, jnp.int32), t),
            key=k_next,
        )
        if ablate == "observe":
            obs = jnp.zeros((env_core.obs_size(params),), dtype)
        else:
            obs = env_core.observe(new_state, params)
        return new_state, (obs, team_reward[0], done)

    return step


def bench(params: EnvParams, ablate: str, state) -> float:
    step = make_step(params, ablate)

    @jax.jit
    def roll(state, key):
        def body(carry, _):
            state, key = carry
            if ablate == "policy_rng":
                actions = jnp.zeros((B, params.n_players, 2), jnp.int32)
            else:
                key, k = jax.random.split(key)
                actions = jax.random.randint(
                    k, (B, params.n_players, 2), 0, 5, dtype=jnp.int32
                )
            state, out = jax.vmap(step)(state, actions)
            return (state, key), out[1]
        (state, _), rews = jax.lax.scan(body, (state, key), None, length=T)
        return state, rews

    key = jax.random.PRNGKey(1)
    t0 = time.perf_counter()
    s, r = roll(state, key)
    jax.block_until_ready(r)
    compile_s = time.perf_counter() - t0

    best = float("inf")
    for i in range(4):
        t0 = time.perf_counter()
        s, r = roll(s, jax.random.PRNGKey(2 + i))
        jax.block_until_ready(r)
        best = min(best, time.perf_counter() - t0)
    us = best / T * 1e6
    print(f"{ablate:12s}: {us:7.1f} us/step  ({B*T/best/1e6:6.2f} M steps/s)"
          f"   [compile {compile_s:.0f}s]", flush=True)
    return us


def main():
    params = EnvParams(players_per_team=PPT)
    state, _ = reset_batch(jax.random.PRNGKey(0), params, B)
    full = bench(params, "none", state)
    for ab in ("physics", "rng_splits", "kickoff", "kick", "possession",
               "dribble", "rewards", "observe", "policy_rng"):
        us = bench(params, ab, state)
        print(f"   -> {ab} marginal cost: {full - us:+.1f} us/step", flush=True)


if __name__ == "__main__":
    main()
