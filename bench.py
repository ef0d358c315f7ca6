"""Throughput benchmark — BASELINE.md configs (headline: config 3).

Default run is config 3: 2v2 FutbolEnv, 4096-env batch with auto-reset,
random policy, full rollout under jit+lax.scan. Prints exactly ONE JSON
line on the last output line:

    {"metric": "env_steps_per_sec", "value": N, "unit": "steps/s",
     "vs_baseline": R}

``vs_baseline`` is value / 1,000,000 — the driver's north-star target of
>=1M env-steps/s per v5e chip (BASELINE.json). The reference publishes no
benchmark numbers (BASELINE.md: `published: {}`), so the target is the
operative baseline.

Other presets (--config):
  2: 2v2, 256 envs, jit+vmap random-policy throughput
  3: 2v2, 4096 envs, auto-reset (default; the headline)
  4: 3v3, 16384 envs, PPO rollout-buffer collection (policy fwd + GAE)
  5: 5v5, 65536 envs, sharded PPO iteration incl. grad pmean collective
     (single-chip here; runs unchanged on a multi-host mesh)
  6: 2v2, 4096 envs, policy-in-kernel self-play (both teams' MLP actors
     on the MXU inside the fused Pallas rollout kernel)

Usage: python bench.py [--config 3] [--envs N] [--steps T] [--ppt P]
"""

from __future__ import annotations

import argparse
import json
import time


CONFIGS = {
    2: dict(ppt=2, envs=256, steps=512),
    3: dict(ppt=2, envs=4096, steps=512),
    4: dict(ppt=3, envs=16384, steps=128),
    5: dict(ppt=5, envs=65536, steps=64),
    6: dict(ppt=2, envs=4096, steps=512),
}


def bench_rollout_fused(args) -> float:
    """Configs 2-3 on the Pallas fused-rollout kernel (ops/fused_rollout.py):
    the whole T-step rollout is ONE Mosaic kernel, state resident in VMEM,
    on-core PRNG. Measured ~3.8x the jnp path on the v5e chip."""
    import jax
    import jax.numpy as jnp

    from gym_futbol_tpu import EnvParams
    from gym_futbol_tpu.ops import fused_rollout, pack_state
    from gym_futbol_tpu.vector import reset_batch

    params = EnvParams(players_per_team=args.ppt)
    state, _ = reset_batch(jax.random.PRNGKey(0), params, args.envs)
    sf, si = pack_state(state, params)
    block = min(2048, args.envs)

    t0 = time.perf_counter()
    sf, si, rew = fused_rollout(
        sf, si, jnp.asarray([1], jnp.int32), params, n_steps=args.steps,
        block=block,
    )
    jax.device_get(rew[-1, :1, :1])
    if args.verbose:
        print(f"# fused compile+first-run: {time.perf_counter() - t0:.1f}s "
              f"on {jax.devices()[0]}")
    # second warmup: the first post-compile call can trigger a one-time
    # re-specialization (output layouts/shardings differ from the initial
    # placement); it must not pollute the timed loop.
    sf, si, rew = fused_rollout(
        sf, si, jnp.asarray([1], jnp.int32), params, n_steps=args.steps,
        block=block,
    )
    jax.device_get(rew[-1, :1, :1])

    t0 = time.perf_counter()
    for i in range(args.iters):
        sf, si, rew = fused_rollout(
            sf, si, jnp.asarray([2 + i], jnp.int32), params,
            n_steps=args.steps, block=block,
        )
    jax.device_get(rew[-1, :1, :1])
    dt = (time.perf_counter() - t0) / args.iters
    return args.envs * args.steps / dt


def bench_rollout(args) -> float:
    """Configs 2-3: random-policy rollout with auto-reset. Returns steps/s."""
    import jax

    from gym_futbol_tpu import EnvParams
    from gym_futbol_tpu.parallel import make_mesh, shard_env_state, shard_rollout
    from gym_futbol_tpu.vector import reset_batch

    params = EnvParams(players_per_team=args.ppt)
    mesh = make_mesh()
    run = shard_rollout(mesh, params, args.steps)

    state, _ = reset_batch(jax.random.PRNGKey(0), params, args.envs)
    state = shard_env_state(state, mesh)

    # NOTE: sync via device_get, NOT block_until_ready — on the axon
    # backend block_until_ready returns before execution completes for
    # donated/sharded outputs, which inflates steps/s by >100x.
    t0 = time.perf_counter()
    state, outs = run(state, jax.random.PRNGKey(1))
    jax.device_get(outs.reward[-1, :1])
    if args.verbose:
        print(f"# compile+first-run: {time.perf_counter() - t0:.1f}s "
              f"on {jax.devices()[0]}")
    # second warmup (see bench_rollout_fused)
    state, outs = run(state, jax.random.PRNGKey(1))
    jax.device_get(outs.reward[-1, :1])

    # Timed loop: iterations chain through the donated state, so fetching
    # the last iteration's output waits for all of them.
    t0 = time.perf_counter()
    for i in range(args.iters):
        state, outs = run(state, jax.random.PRNGKey(2 + i))
    jax.device_get(outs.reward[-1, :1])
    dt = (time.perf_counter() - t0) / args.iters
    return args.envs * args.steps / dt


def bench_selfplay_fused(args) -> float:
    """Config 6: policy-vs-policy rollout with both per-team MLP actors
    running on the MXU inside the fused kernel (ops/fused_actor.py)."""
    import jax
    import jax.numpy as jnp

    from gym_futbol_tpu import EnvParams
    from gym_futbol_tpu.ops import pack_state
    from gym_futbol_tpu.ops.fused_actor import fused_selfplay_rollout, init_mlp
    from gym_futbol_tpu.vector import reset_batch

    params = EnvParams(players_per_team=args.ppt)
    state, _ = reset_batch(jax.random.PRNGKey(0), params, args.envs)
    sf, si = pack_state(state, params)
    wa = init_mlp(jax.random.PRNGKey(1), params)
    wb = init_mlp(jax.random.PRNGKey(2), params)
    block = min(1024, args.envs)

    def once(sf, si, seed):
        sf, si, rew, goals = fused_selfplay_rollout(
            sf, si, wa, wb, jnp.asarray([seed], jnp.int32), params,
            n_steps=args.steps, block=block,
        )
        return sf, si, rew

    t0 = time.perf_counter()
    sf, si, rew = once(sf, si, 1)
    jax.device_get(rew[-1, :1, :1])
    if args.verbose:
        print(f"# compile+first-run: {time.perf_counter() - t0:.1f}s")
    sf, si, rew = once(sf, si, 1)
    jax.device_get(rew[-1, :1, :1])

    t0 = time.perf_counter()
    for i in range(args.iters):
        sf, si, rew = once(sf, si, 2 + i)
    jax.device_get(rew[-1, :1, :1])
    dt = (time.perf_counter() - t0) / args.iters
    return args.envs * args.steps / dt


def bench_ppo(args, with_update: bool, fused: bool = False) -> float:
    """Config 4 (rollout collection into the PPO buffer + GAE) and
    config 5 (full sharded PPO iteration). Returns env-steps/s.
    ``fused=True`` collects experience with the Pallas fused-collect
    kernel (policy forward on the MXU inside the env kernel)."""
    import functools

    import jax

    from gym_futbol_tpu import EnvParams
    from gym_futbol_tpu.models.policy import ActorCritic
    from gym_futbol_tpu.parallel import (
        make_mesh, shard_env_state, shard_train_iteration,
    )
    from gym_futbol_tpu.ppo import (
        PPOConfig, collect_rollout, collect_rollout_fused, compute_gae,
        init_runner, make_optimizer, train_iteration,
    )

    env_params = EnvParams(players_per_team=args.ppt)
    cfg = PPOConfig(rollout_steps=args.steps)
    # per-team policy (self-play; ppo.collect_rollout docstring)
    model = ActorCritic(n_players=env_params.players_per_team)
    tx = make_optimizer(cfg)
    mesh = make_mesh()
    runner = init_runner(
        jax.random.PRNGKey(0), model, env_params, cfg, n_envs=args.envs, tx=tx
    )
    runner = runner.replace(env_state=shard_env_state(runner.env_state, mesh))
    collect_fn = collect_rollout_fused if fused else collect_rollout

    if with_update:
        iter_kw = {"collect_fn": collect_fn}
        if fused:
            # the Pallas fused-update kernel consumes the fused collect's
            # feature-major buffer directly (ops/fused_update.py)
            from gym_futbol_tpu.ppo import update_epochs_fused

            iter_kw["update_fn"] = update_epochs_fused
        fn = shard_train_iteration(
            mesh, model, env_params, cfg, tx,
            iteration_fn=functools.partial(train_iteration, **iter_kw),
        )

        def once(r):
            r, metrics = fn(r)
            return r, metrics["loss"]
    else:
        @jax.jit
        def collect(r):
            r, traj, last_v = collect_fn(r, model, env_params, cfg)
            adv, ret = compute_gae(traj, last_v, cfg)
            return r, adv.mean()

        once = collect

    # device_get sync (see bench_rollout note about axon block_until_ready)
    t0 = time.perf_counter()
    runner, m = once(runner)
    jax.device_get(m)
    if args.verbose:
        print(f"# compile+first-run: {time.perf_counter() - t0:.1f}s")
    # second warmup: the first post-compile call re-specializes once (the
    # carried runner's shardings/layouts differ from the initial
    # placement) at ~3s for config 4 — it must not pollute the timed loop.
    runner, m = once(runner)
    jax.device_get(m)
    t0 = time.perf_counter()
    for _ in range(args.iters):
        runner, m = once(runner)
    jax.device_get(m)
    dt = (time.perf_counter() - t0) / args.iters
    return args.envs * args.steps / dt


def bench_scaling(args) -> dict:
    """--scaling: WEAK-scaling sweep over device counts (north-star #2:
    >=90% efficiency 1 chip -> 1 host -> >=2 hosts).

    Runs the full sharded PPO iteration (the only code path with a
    collective) on meshes of 1, 2, 4, ... devices with a FIXED per-device
    env count, and reports throughput efficiency vs the 1-device run.
    The same code measures a real pod slice; on this sandbox's fake
    8-device CPU mesh (--fake-devices) the numbers are a proxy that
    exercises every sharding/collective path end-to-end.

    Run on CPU fakes:
        PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
        XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python bench.py --scaling
    """
    import jax

    from gym_futbol_tpu import EnvParams
    from gym_futbol_tpu.models.policy import ActorCritic
    from gym_futbol_tpu.parallel import shard_env_state, shard_train_iteration
    from gym_futbol_tpu.parallel.mesh import make_mesh
    from gym_futbol_tpu.ppo import PPOConfig, init_runner, make_optimizer

    devices = jax.devices()
    counts = [d for d in (1, 2, 4, 8, 16, 32, 64) if d <= len(devices)]
    per_dev = args.envs or 512
    steps = args.steps or 32

    env_params = EnvParams(players_per_team=args.ppt or 2)
    cfg = PPOConfig(rollout_steps=steps)
    model = ActorCritic(n_players=env_params.players_per_team)
    tx = make_optimizer(cfg)

    rates = {}
    for d in counts:
        mesh = make_mesh(devices[:d])
        n_envs = per_dev * d
        runner = init_runner(
            jax.random.PRNGKey(0), model, env_params, cfg, n_envs=n_envs,
            tx=tx,
        )
        runner = runner.replace(
            env_state=shard_env_state(runner.env_state, mesh)
        )
        fn = shard_train_iteration(mesh, model, env_params, cfg, tx)
        runner, m = fn(runner)          # compile + first run
        jax.device_get(m["loss"])
        runner, m = fn(runner)          # re-specialization warmup
        jax.device_get(m["loss"])
        t0 = time.perf_counter()
        for _ in range(args.iters):
            runner, m = fn(runner)
        jax.device_get(m["loss"])
        dt = (time.perf_counter() - t0) / args.iters
        rates[d] = n_envs * steps / dt
        eff = rates[d] / (d * rates[1])
        print(f"# scaling {d:3d} dev x {per_dev} envs: "
              f"{rates[d]:12.0f} steps/s  efficiency {eff:6.3f}")

    d_max = counts[-1]
    return {
        "metric": "weak_scaling_efficiency",
        "value": round(rates[d_max] / (d_max * rates[1]), 4),
        "unit": f"fraction of linear at {d_max} devices "
                f"({per_dev} envs/device)",
        "vs_baseline": round(rates[d_max] / (d_max * rates[1]) / 0.9, 3),
        "steps_per_sec": {str(d): round(r) for d, r in rates.items()},
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", type=int, default=3, choices=sorted(CONFIGS))
    ap.add_argument("--scaling", action="store_true",
                    help="weak-scaling efficiency sweep over device counts "
                         "(BASELINE north-star #2); --envs becomes "
                         "envs-per-device (default 512)")
    ap.add_argument("--envs", type=int, default=None)
    ap.add_argument("--steps", type=int, default=None)
    ap.add_argument("--ppt", type=int, default=None)
    ap.add_argument("--iters", type=int, default=None,
                    help="timed iterations (default 10; 40 for config 2, "
                         "whose ~10ms iterations are small against the "
                         "per-batch fixed dispatch/sync cost): the "
                         "one-time final-sync latency (device_get through "
                         "the axon tunnel, ~40ms) amortizes over this "
                         "count — 3 understated steady-state throughput "
                         "by ~20%% at config 3, and 10 read config 2 with "
                         "~1.7x run-to-run spread (CLAUDE.md timing rule: "
                         ">=20 iters when per-iter wall < ~50ms)")
    ap.add_argument(
        "--impl", choices=("auto", "fused", "jnp"), default="auto",
        help="rollout implementation for configs 2-3: Pallas fused kernel "
             "('fused'), jit+vmap ('jnp'), or fused-with-fallback ('auto')",
    )
    ap.add_argument("--assert-floor", type=float, default=None,
                    help="fail (exit 1, ok:false in the JSON) if the "
                         "measured steps/s is below this floor — the "
                         "perf-regression gate (parity/check_perf.py)")
    ap.add_argument("--verbose", action="store_true")
    args = ap.parse_args()

    from gym_futbol_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    if args.scaling:
        if args.iters is None:
            args.iters = 10
        print(json.dumps(bench_scaling(args)))
        return

    preset = CONFIGS[args.config]
    args.envs = args.envs or preset["envs"]
    args.steps = args.steps or preset["steps"]
    args.ppt = args.ppt or preset["ppt"]
    if args.iters is None:
        args.iters = 40 if args.config == 2 else 10

    if args.config in (2, 3):
        if args.impl == "jnp":
            steps_per_sec = bench_rollout(args)
        else:
            try:
                steps_per_sec = bench_rollout_fused(args)
            except Exception as e:  # pragma: no cover - robustness on odd HW
                if args.impl == "fused":
                    raise
                print(f"# fused path failed ({type(e).__name__}: {e}); "
                      "falling back to jnp path")
                steps_per_sec = bench_rollout(args)
    elif args.config == 6:
        steps_per_sec = bench_selfplay_fused(args)
    else:
        with_update = args.config == 5
        if args.impl == "jnp":
            steps_per_sec = bench_ppo(args, with_update)
        else:
            try:
                steps_per_sec = bench_ppo(args, with_update, fused=True)
            except Exception as e:  # pragma: no cover
                if args.impl == "fused":
                    raise
                print(f"# fused collect failed ({type(e).__name__}: {e}); "
                      "falling back to jnp collect")
                steps_per_sec = bench_ppo(args, with_update)

    record = {
        "metric": "env_steps_per_sec",
        "value": round(steps_per_sec),
        "unit": "steps/s",
        "vs_baseline": round(steps_per_sec / 1_000_000, 3),
    }
    if args.assert_floor is not None:
        record["floor"] = args.assert_floor
        record["ok"] = steps_per_sec >= args.assert_floor
    print(json.dumps(record))
    if args.assert_floor is not None and not record["ok"]:
        raise SystemExit(1)


if __name__ == "__main__":
    main()
