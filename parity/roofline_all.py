"""Speed-of-light evidence for EVERY gated bench config (VERDICT r4
item 2): name the bounding resource and the achieved fraction of its
measured peak for configs 4 (fused collect), 6 (policy-in-kernel
self-play) and 5 (full PPO iteration). Config 3's VPU roofline lives in
parity/roofline.py; this harness extends the same methodology:

- Peaks are MEASURED on this chip (VPU f32 FMA chain, HBM axpy stream —
  imported from roofline.py — plus a bf16 MXU matmul chain here), not
  paper specs.
- Per-env-step resource demands are ANALYTIC: XLA's cost_analysis for
  the env math (identical scalar functions trace into the kernels), a
  dot-product flop model for the in-kernel MLPs, and the kernel's HBM
  buffer-write contract for bytes (ops/fused_collect.py docstring
  shapes).
- Config 4/6 additionally run a live ABLATION: the same kernel timed
  with the real policy vs a tiny (8-wide) policy splits the wall time
  into policy-matmul vs env+sampling cost without trusting the flop
  model.
- Config 5 is a wall-time DECOMPOSITION (collect / GAE / 16 fused
  minibatch steps / full iteration) with the fused update's own MXU
  utilization derived from its fwd+bwd flop count.

Run (TPU, ~4 min warm):
    python parity/roofline_all.py [--skip 5] [--c4 3.96e7 --c6 5.94e7]
Prints one JSON line per config; DESIGN.md §3's table comes from here.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from gym_futbol_tpu import EnvParams  # noqa: E402
from gym_futbol_tpu import env as env_core  # noqa: E402
from gym_futbol_tpu.utils.cache import enable_compilation_cache  # noqa: E402
from roofline import (  # noqa: E402
    flops_per_env_step,
    measured_hbm_bw,
    measured_vpu_peak,
)

enable_compilation_cache()

HERE = os.path.dirname(os.path.abspath(__file__))
BENCH = os.path.join(os.path.dirname(HERE), "bench.py")


def measured_mxu_peak(m: int = 1024, k: int = 1024, n: int = 1024,
                      depth: int = 256, iters: int = 10) -> float:
    """bf16 matmul chain throughput (f32 accumulation — the default
    single-pass-bf16 MXU mode every production kernel here uses): y = y @ W
    chained ``depth`` times inside one program."""

    @jax.jit
    def chain(y, w):
        return jax.lax.fori_loop(
            0, depth, lambda i, v: jnp.tanh(v @ w), y
        )

    y = jnp.ones((m, k), jnp.bfloat16)
    w = (jnp.eye(k, n, dtype=jnp.float32) * 0.99).astype(jnp.bfloat16)
    jax.device_get(chain(chain(y, w), w)[0, 0])
    t0 = time.perf_counter()
    z = y
    for _ in range(iters):
        z = chain(z, w)
    jax.device_get(z[0, 0])
    dt = time.perf_counter() - t0
    return 2.0 * m * k * n * depth * iters / dt


def mlp_flops_per_sample(f: int, hidden, n_out: int) -> float:
    """Dot-product flops (2*m*k) for one sample through torso + heads."""
    dims = [f, *hidden]
    fl = sum(2.0 * a * b for a, b in zip(dims[:-1], dims[1:]))
    fl += 2.0 * dims[-1] * n_out
    return fl


def bench_value(config: int, timeout: int = 1800) -> float:
    import subprocess

    proc = subprocess.run(
        [sys.executable, BENCH, "--config", str(config)],
        capture_output=True, text=True, timeout=timeout,
    )
    return float(json.loads(proc.stdout.strip().splitlines()[-1])["value"])


def time_fused_collect(env_params: EnvParams, hidden, n_envs: int,
                       n_steps: int, iters: int = 10) -> float:
    """Steady-state seconds per fused_collect kernel call (kernel only,
    no Transition relayout/GAE)."""
    from gym_futbol_tpu.models.policy import ActorCritic, init_params
    from gym_futbol_tpu.ops import pack_state
    from gym_futbol_tpu.ops.fused_collect import (
        flatten_actor_critic,
        fused_collect,
    )
    from gym_futbol_tpu.vector import reset_batch

    model = ActorCritic(n_players=env_params.players_per_team,
                        hidden=tuple(hidden))
    params = init_params(jax.random.PRNGKey(0), model, env_params)
    w = flatten_actor_critic(params, model)
    state, _ = reset_batch(jax.random.PRNGKey(1), env_params, n_envs)
    sf, si = pack_state(state, env_params)
    seed = jnp.asarray([1], jnp.int32)

    # jit-wrapped: the eager pallas_call path donates the state inputs
    # (reuse across timing calls then reads deleted buffers); syncing on
    # last_value (small [2, nb, 128]) waits for the whole program.
    once = jax.jit(
        lambda sf, si, s: fused_collect(
            sf, si, w, s, env_params, n_steps, block=2048
        )[9]
    )
    lv = once(sf, si, seed)
    jax.device_get(lv[0, :1, :1])
    lv = once(sf, si, seed)
    jax.device_get(lv[0, :1, :1])
    t0 = time.perf_counter()
    for i in range(iters):
        lv = once(sf, si, jnp.asarray([2 + i], jnp.int32))
    jax.device_get(lv[0, :1, :1])
    return (time.perf_counter() - t0) / iters


def time_fused_selfplay(env_params: EnvParams, hidden, n_envs: int,
                        n_steps: int, iters: int = 10) -> float:
    from gym_futbol_tpu.ops import pack_state
    from gym_futbol_tpu.ops.fused_actor import (
        fused_selfplay_rollout,
        init_mlp,
    )
    from gym_futbol_tpu.vector import reset_batch

    wa = init_mlp(jax.random.PRNGKey(1), env_params, hidden=tuple(hidden))
    wb = init_mlp(jax.random.PRNGKey(2), env_params, hidden=tuple(hidden))
    state, _ = reset_batch(jax.random.PRNGKey(0), env_params, n_envs)
    sf, si = pack_state(state, env_params)

    once = jax.jit(
        lambda sf, si, s: fused_selfplay_rollout(
            sf, si, wa, wb, s, env_params, n_steps=n_steps, block=1024,
        )[2]
    )
    rew = once(sf, si, jnp.asarray([1], jnp.int32))
    jax.device_get(rew[:1])
    rew = once(sf, si, jnp.asarray([1], jnp.int32))
    jax.device_get(rew[:1])
    t0 = time.perf_counter()
    for i in range(iters):
        rew = once(sf, si, jnp.asarray([2 + i], jnp.int32))
    jax.device_get(rew[:1])
    return (time.perf_counter() - t0) / iters


def analyze_collect_like(
    name: str, steps_per_sec: float, env_params: EnvParams,
    mlp_views: float, hidden, n_out: int, hbm_bytes_per_step: float,
    peaks: dict, kernel_s_real: float, kernel_s_tiny: float,
    kernel_steps: float,
) -> dict:
    """Shared config-4/6 analysis: three utilizations + live ablation."""
    f_dim = env_core.obs_size(env_params)
    vpu_fl, _ = flops_per_env_step(env_params)
    mxu_fl = mlp_views * mlp_flops_per_sample(f_dim, hidden, n_out)
    util = {
        "vpu": steps_per_sec * vpu_fl / peaks["vpu"],
        "mxu": steps_per_sec * mxu_fl / peaks["mxu"],
        "hbm": steps_per_sec * hbm_bytes_per_step / peaks["hbm"],
    }
    bound = max(util, key=util.get)
    policy_frac = max(0.0, 1.0 - kernel_s_tiny / kernel_s_real)
    return {
        "metric": f"{name}_bounding_resource",
        "value": round(util[bound], 4),
        "unit": f"fraction of measured {bound.upper()} peak",
        "bound": bound,
        "steps_per_sec": steps_per_sec,
        "utilization": {k: round(v, 4) for k, v in util.items()},
        "vpu_flops_per_env_step": round(vpu_fl, 1),
        "mxu_flops_per_env_step": round(mxu_fl, 1),
        "hbm_bytes_per_env_step": hbm_bytes_per_step,
        # live ablation: fraction of kernel wall attributable to the
        # policy matmuls (real hidden vs 8-wide hidden)
        "kernel_steps_per_sec": round(kernel_steps, 0),
        "policy_wall_fraction": round(policy_frac, 4),
        "env_wall_fraction": round(1.0 - policy_frac, 4),
    }


def config5_decomposition(peaks: dict) -> dict:
    """Wall-time decomposition of the full 5v5 PPO iteration on the
    production path (fused collect + fused update)."""
    import gc

    from gym_futbol_tpu.models.policy import ActorCritic
    from gym_futbol_tpu.ppo import (
        PPOConfig,
        collect_rollout_fused,
        compute_gae,
        init_runner,
        make_optimizer,
        train_iteration,
        update_epochs_fused,
    )

    env_params = EnvParams(players_per_team=5)
    n_envs, n_steps = 65536, 64
    cfg = PPOConfig(rollout_steps=n_steps)
    model = ActorCritic(n_players=env_params.players_per_team)
    tx = make_optimizer(cfg)
    runner = init_runner(jax.random.PRNGKey(0), model, env_params, cfg,
                         n_envs=n_envs, tx=tx)

    def timed(fn, *args, iters=10):
        out = fn(*args)
        jax.device_get(jax.tree.leaves(out)[0])
        out = fn(*args)
        jax.device_get(jax.tree.leaves(out)[0])
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        jax.device_get(jax.tree.leaves(out)[0])
        return out, (time.perf_counter() - t0) / iters

    collect = jax.jit(
        lambda r: collect_rollout_fused(r, model, env_params, cfg)
    )
    (runner2, traj, last_v), t_col = timed(collect, runner)
    gae = jax.jit(lambda tr, lv: compute_gae(tr, lv, cfg))
    (adv, ret), t_gae = timed(gae, traj, last_v)
    upd = jax.jit(
        lambda p, o, tr, a, r, k: update_epochs_fused(
            p, o, tr, a, r, k, model, tx, cfg
        )
    )
    _, t_upd = timed(
        upd, runner.params, runner.opt_state, traj, adv, ret,
        jax.random.PRNGKey(1),
    )
    del traj, adv, ret, last_v, runner2
    gc.collect()
    full = jax.jit(
        lambda r: train_iteration(
            r, model, env_params, cfg, tx,
            collect_fn=collect_rollout_fused,
            update_fn=update_epochs_fused,
        )
    )
    _, t_full = timed(full, runner)

    # fused-update MXU utilization: fwd 2*m*k flops per dot + backward
    # ~2x the forward's matmul flops (dX and dW per layer)
    f_dim = env_core.obs_size(env_params)
    n_out = model.n_players * 2 * 5 + 1
    n_samples = 2 * n_envs * n_steps * cfg.epochs  # each sample: E epochs
    upd_flops = 3.0 * n_samples * mlp_flops_per_sample(
        f_dim, model.hidden, n_out
    )
    steps = n_envs * n_steps
    # NOTE on decomposition: standalone-jitted GAE pays a round-trip of
    # the whole multi-GB Transition pytree through its jit boundary, so
    # its standalone wall time is NOT its marginal cost inside the full
    # iteration (where XLA fuses the reverse scan into the pipeline).
    # The meaningful split is collect + update vs full; gae+optimizer
    # marginal is the (noise-level) remainder.
    return {
        "metric": "config5_iteration_decomposition",
        "value": round(steps / t_full / 1e6, 2),
        "unit": "M env-steps/s full iteration",
        "phases_ms": {
            "collect": round(t_col * 1e3, 1),
            "gae_standalone(see_note)": round(t_gae * 1e3, 1),
            "update_16_minibatches": round(t_upd * 1e3, 1),
            "full_iteration": round(t_full * 1e3, 1),
        },
        "phase_fractions_of_full": {
            "collect": round(t_col / t_full, 3),
            "update": round(t_upd / t_full, 3),
            "gae+opt+relayout_marginal": round(
                (t_full - t_col - t_upd) / t_full, 3),
        },
        "update_mxu_utilization": round(upd_flops / t_upd / peaks["mxu"],
                                        4),
    }


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--c4", type=float, default=None,
                    help="measured config-4 steps/s (default: run bench)")
    ap.add_argument("--c6", type=float, default=None)
    ap.add_argument("--skip", type=int, nargs="*", default=[],
                    choices=(4, 5, 6))
    args = ap.parse_args()

    peaks = {
        "vpu": measured_vpu_peak(),
        "hbm": measured_hbm_bw(),
        "mxu": measured_mxu_peak(),
    }
    print(json.dumps({
        "metric": "measured_peaks",
        "vpu_gflops": round(peaks["vpu"] / 1e9, 1),
        "hbm_gbs": round(peaks["hbm"] / 1e9, 1),
        "mxu_bf16_gflops": round(peaks["mxu"] / 1e9, 1),
    }), flush=True)

    results = []
    if 4 not in args.skip:
        p4 = EnvParams(players_per_team=3)
        c4 = args.c4 or bench_value(4)
        f_pad = -(-env_core.obs_size(p4) // 8) * 8
        t_real = time_fused_collect(p4, (256, 256), 16384, 128)
        t_tiny = time_fused_collect(p4, (8,), 16384, 128)
        rec = analyze_collect_like(
            "config4_fused_collect", c4, p4, mlp_views=2.0,
            hidden=(256, 256), n_out=p4.players_per_team * 2 * 5 + 1,
            hbm_bytes_per_step=2.0 * (4.0 * f_pad + 24.0), peaks=peaks,
            kernel_s_real=t_real, kernel_s_tiny=t_tiny,
            kernel_steps=16384 * 128 / t_real,
        )
        results.append(rec)
        print(json.dumps(rec), flush=True)
    if 6 not in args.skip:
        p6 = EnvParams(players_per_team=2)
        c6 = args.c6 or bench_value(6)
        t_real = time_fused_selfplay(p6, (128, 128), 4096, 512)
        t_tiny = time_fused_selfplay(p6, (8,), 4096, 512)
        rec = analyze_collect_like(
            "config6_policy_in_kernel", c6, p6, mlp_views=2.0,
            hidden=(128, 128), n_out=p6.players_per_team * 2 * 5,
            hbm_bytes_per_step=4.0 + 2.0, peaks=peaks,
            kernel_s_real=t_real, kernel_s_tiny=t_tiny,
            kernel_steps=4096 * 512 / t_real,
        )
        results.append(rec)
        print(json.dumps(rec), flush=True)
    if 5 not in args.skip:
        rec = config5_decomposition(peaks)
        results.append(rec)
        print(json.dumps(rec), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
