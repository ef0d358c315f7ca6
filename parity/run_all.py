"""Run EVERY parity/consistency gate and emit one JSON line.

The automated umbrella over the individual harnesses (VERDICT r1 item 5;
concurrent lanes + routine-runnable wall time are VERDICT r2 item 6):

    CPU gates  (forced JAX_PLATFORMS=cpu, no TPU tunnel; each gate in its
                own thread — they are separate processes on a multi-core
                host):
      - check_env_parity      full env.step vs the C++ oracle (~1e-13)
      - check_physics_parity  physics substep vs the oracle (slimmed
                              case set; full matrix via --exhaustive)
    TPU lane   (ambient platform; SEQUENTIAL — one chip; skipped with
                --cpu-only):
      - check_fused_actor     policy-in-kernel rollout, statistical
      - check_fused_collect   fused-collect logp/value/mirror consistency
      - check_fused_update    fused PPO-update grads vs jax.grad
      - check_fused_recurrent LSTM-in-kernel collect vs flax replay
      - check_perf            bench floors (opt-in: --with-perf)
      - check_learning        trained-vs-random win gate (opt-in:
                              --with-learning; ~3 min/seed on the v5e)

The two lanes run CONCURRENTLY, so warm wall time is max(TPU lane,
slowest CPU gate), not the sum. Each gate runs in its OWN subprocess —
the CPU ones must skip the axon TPU tunnel (PALLAS_AXON_POOL_IPS=) and
the TPU ones must keep it, and jax platform selection is per-process
state.

Prints one summary JSON object on the last line and exits nonzero if any
gate fails. Usage:

    python parity/run_all.py [--cpu-only] [--with-perf]
                             [--with-learning] [--timeout SECONDS]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time
from concurrent.futures import ThreadPoolExecutor

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, HERE)

from _tunnel import child_env, ensure_parent_unregistered  # noqa: E402

# Pure-CPU orchestrator; its CHILDREN are the TPU clients, and a
# tunnel-registered parent blocks its own children's device acquisition
# (parity/_tunnel.py docstring).
ensure_parent_unregistered()

CPU_GATES = ["check_env_parity.py", "check_physics_parity.py"]
TPU_GATES = ["check_fused_actor.py", "check_fused_collect.py",
             "check_fused_update.py", "check_fused_recurrent.py"]


def run_gate(script: str, cpu: bool, timeout: int,
             extra_args: list[str] | None = None) -> dict:
    env = child_env(tpu=not cpu)
    if cpu:
        env["JAX_PLATFORMS"] = "cpu"
    t0 = time.perf_counter()
    try:
        proc = subprocess.run(
            [sys.executable, os.path.join(HERE, script), *(extra_args or [])],
            env=env, capture_output=True, text=True, timeout=timeout,
        )
        rc = proc.returncode
        tail = (proc.stdout.strip().splitlines() or [""])[-1]
        if rc != 0 and proc.stderr:
            tail = proc.stderr.strip().splitlines()[-1]
    except subprocess.TimeoutExpired:
        rc, tail = 124, "timeout"
    rec = {
        "gate": script.removesuffix(".py"),
        "ok": rc == 0,
        "seconds": round(time.perf_counter() - t0, 1),
        "last_line": tail[:200],
    }
    print(f"# {'OK ' if rec['ok'] else 'FAIL'} {rec['gate']:24s} "
          f"{rec['seconds']:7.1f}s  {rec['last_line']}", flush=True)
    return rec


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu-only", action="store_true",
                    help="skip the TPU-only kernel gates")
    ap.add_argument("--with-perf", action="store_true",
                    help="also run check_perf.py (bench regression "
                         "floors) in the TPU lane")
    ap.add_argument("--with-learning", action="store_true",
                    help="also run check_learning.py (trained-vs-random "
                         "win gate) in the TPU lane")
    ap.add_argument("--learning-ppt", type=int, default=2,
                    help="team size for the learning gate (2/3/5; 3 and "
                         "5 run at the BASELINE config-4/5 scales)")
    ap.add_argument("--timeout", type=int, default=1800,
                    help="per-gate timeout (first TPU compile is slow)")
    args = ap.parse_args()

    t_start = time.perf_counter()
    tpu_gates = [(s, None) for s in TPU_GATES]
    if args.with_perf:
        tpu_gates.append(("check_perf.py", None))
    if args.with_learning:
        tpu_gates.append(
            ("check_learning.py", ["--ppt", str(args.learning_ppt)])
        )

    def tpu_lane() -> list[dict]:
        return [run_gate(s, cpu=False, timeout=args.timeout, extra_args=a)
                for s, a in tpu_gates]

    results: list[dict] = []
    with ThreadPoolExecutor(max_workers=len(CPU_GATES) + 1) as ex:
        cpu_futs = [ex.submit(run_gate, s, True, args.timeout)
                    for s in CPU_GATES]
        tpu_fut = None if args.cpu_only else ex.submit(tpu_lane)
        results += [f.result() for f in cpu_futs]
        if tpu_fut is not None:
            results += tpu_fut.result()

    # Loud reminder of what this invocation did NOT certify (VERDICT r3
    # weak #4): the one-command story must not silently be a third of
    # the gates.
    skipped = []
    if args.cpu_only:
        skipped.append("ALL TPU kernel gates (--cpu-only)")
    if not args.with_perf:
        skipped.append("check_perf (bench floors; add --with-perf)")
    if not args.with_learning:
        skipped.append("check_learning (win gate; add --with-learning)")
    for s in skipped:
        print(f"# SKIPPED (not run, not certified): {s}", flush=True)

    ok = all(r["ok"] for r in results)
    print(json.dumps({
        "metric": "parity_gates_passed",
        "value": sum(r["ok"] for r in results),
        "unit": f"of {len(results)}",
        "ok": ok,
        "gates": {r["gate"]: r["ok"] for r in results},
        "skipped": skipped,
        "wall_seconds": round(time.perf_counter() - t_start, 1),
    }))
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
