"""Roofline for the headline fused-rollout kernel (VERDICT r3 weak #7):
is 52.8M env-steps/s actually fast, or merely correct?

The fused rollout is VPU-bound by construction: state tiles live in VMEM
across all T steps (HBM sees 2 state transfers + one [T, B] reward
write — ~0.2 GB/s at the measured rate, noise against ~800 GB/s), and
the env step is pure elementwise math (no matmuls), so the bounding
resource is VPU issue rate. This harness therefore measures three
numbers ON THE SAME CHIP and reports the ratio:

1. ``flops_per_env_step`` — XLA's analytical flop count for one
   ``vmap(env.step)`` program (cost_analysis of the jit-compiled batched
   step, divided by the batch). This counts the jnp path's arithmetic;
   the Pallas kernel traces the SAME scalar-form functions
   (game.py/physics.py), so it is the right op model for both paths.
   Comparisons/selects/int ops are NOT in XLA's flop count, so the
   resulting utilization is an UNDERestimate (the kernel also executes
   every masked select and integer op the flop count ignores).
2. ``vpu_peak`` — a measured f32 elementwise FMA microbenchmark
   (a*x+b chains on a VMEM-resident tile, K deep), not a paper spec.
3. ``achieved`` — bench.py config 3's steps/s x flops_per_env_step.

Run (TPU):  python parity/roofline.py [--steps-per-sec 52.85e6]
Prints one JSON line; the DESIGN.md §3 utilization figure comes from
here.
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
from gym_futbol_tpu.utils.cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()


def flops_per_env_step(params: EnvParams, n_envs: int = 4096) -> float:
    """XLA analytical flops of one batched env.step, per env."""
    from gym_futbol_tpu.vector import reset_batch, step_batch

    state, _ = reset_batch(jax.random.PRNGKey(0), params, n_envs)
    actions = jnp.zeros((n_envs, params.n_players, 2), jnp.int32)
    compiled = (
        jax.jit(lambda s, a: step_batch(s, a, params))
        .lower(state, actions)
        .compile()
    )
    ca = compiled.cost_analysis()
    if isinstance(ca, list):  # older jax returns [dict]
        ca = ca[0]
    return (float(ca["flops"]) / n_envs,
            float(ca.get("transcendentals", 0.0)) / n_envs)


def measured_vpu_peak(
    n_rows: int = 4096, depth: int = 4096, iters: int = 20
) -> float:
    """f32 FMA chain throughput on a [n_rows, 128] VMEM-resident tile:
    2 flops per element per chain link, chained depth times INSIDE one
    program via fori_loop (4.3 GFLOP per dispatch at the defaults — a
    per-call chain was dispatch-latency-bound through the axon tunnel
    and read ~1 GFLOP/s). Measures VPU issue rate, not HBM."""

    @jax.jit
    def chain(x):
        a = jnp.float32(1.0000001)
        b = jnp.float32(1e-7)
        return jax.lax.fori_loop(0, depth, lambda i, v: v * a + b, x)

    x = jnp.ones((n_rows, 128), jnp.float32)
    # warm up twice (axon re-specializes once post-compile)
    jax.device_get(chain(chain(x))[0, 0])
    t0 = time.perf_counter()
    y = x
    for _ in range(iters):
        y = chain(y)
    jax.device_get(y[0, 0])
    dt = time.perf_counter() - t0
    return 2.0 * n_rows * 128 * depth * iters / dt


def measured_hbm_bw(n: int = 1 << 26, iters: int = 20) -> float:
    """Streaming axpy bandwidth: 2 reads + 1 write of [n] f32."""

    @jax.jit
    def axpy(x, y):
        return x * jnp.float32(1.5) + y

    x = jnp.ones((n,), jnp.float32)
    y = jnp.ones((n,), jnp.float32)
    jax.device_get(axpy(x, axpy(x, y))[0])
    t0 = time.perf_counter()
    z = y
    for _ in range(iters):
        z = axpy(x, z)
    jax.device_get(z[0])
    dt = time.perf_counter() - t0
    return 3.0 * 4.0 * n * iters / dt


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps-per-sec", type=float, default=None,
                    help="measured config-3 fused-rollout rate; default: "
                         "re-measure via bench.py --config 3 in-process")
    ap.add_argument("--envs", type=int, default=4096)
    args = ap.parse_args()

    params = EnvParams(players_per_team=2)
    fpes, tpes = flops_per_env_step(params, args.envs)

    steps = args.steps_per_sec
    if steps is None:
        import subprocess

        bench = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "bench.py",
        )
        proc = subprocess.run(
            [sys.executable, bench, "--config", "3"],
            capture_output=True, text=True, timeout=1200,
        )
        steps = float(
            json.loads(proc.stdout.strip().splitlines()[-1])["value"]
        )

    vpu = measured_vpu_peak()
    hbm = measured_hbm_bw()
    achieved = steps * fpes
    # HBM traffic of the fused kernel per env-step: the per-step [B]
    # reward write is the only per-step HBM touch (state: 2 transfers
    # per WHOLE rollout, amortized to ~0).
    hbm_bytes_per_step = 4.0
    print(json.dumps({
        "metric": "fused_rollout_vpu_utilization",
        "value": round(achieved / vpu, 4),
        "unit": "fraction of measured VPU f32 FMA peak (flop-count "
                "basis; selects/int ops excluded -> underestimate)",
        "steps_per_sec": steps,
        "flops_per_env_step": round(fpes, 1),
        "transcendentals_per_env_step": round(tpes, 1),
        "achieved_gflops": round(achieved / 1e9, 1),
        "measured_vpu_peak_gflops": round(vpu / 1e9, 1),
        "measured_hbm_gbs": round(hbm / 1e9, 1),
        "kernel_hbm_gbs": round(steps * hbm_bytes_per_step / 1e9, 2),
        "hbm_utilization": round(steps * hbm_bytes_per_step / hbm, 4),
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
