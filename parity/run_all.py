"""Run EVERY parity/consistency gate and emit one JSON line.

The automated umbrella over the individual harnesses (VERDICT r1 item 5):

    CPU gates  (forced JAX_PLATFORMS=cpu, no TPU tunnel):
      - check_env_parity      full env.step vs the C++ oracle (~1e-13)
      - check_physics_parity  physics substep vs the oracle
    TPU gates  (ambient platform; skipped with --cpu-only):
      - check_fused_actor     policy-in-kernel rollout, statistical
      - check_fused_collect   fused-collect logp/value/mirror consistency

Each gate runs in its OWN subprocess — the CPU ones must skip the axon
TPU tunnel (PALLAS_AXON_POOL_IPS=) and the TPU ones must keep it, and
jax platform selection is per-process state.

Prints one summary JSON object on the last line and exits nonzero if any
gate fails. Usage:

    python parity/run_all.py [--cpu-only] [--timeout SECONDS]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))

CPU_GATES = ["check_env_parity.py", "check_physics_parity.py"]
TPU_GATES = ["check_fused_actor.py", "check_fused_collect.py"]


def run_gate(script: str, cpu: bool, timeout: int) -> dict:
    env = dict(os.environ)
    if cpu:
        env["PALLAS_AXON_POOL_IPS"] = ""   # skip TPU tunnel registration
        env["JAX_PLATFORMS"] = "cpu"
    t0 = time.perf_counter()
    try:
        proc = subprocess.run(
            [sys.executable, os.path.join(HERE, script)],
            env=env, capture_output=True, text=True, timeout=timeout,
        )
        rc = proc.returncode
        tail = (proc.stdout.strip().splitlines() or [""])[-1]
        if rc != 0 and proc.stderr:
            tail = proc.stderr.strip().splitlines()[-1]
    except subprocess.TimeoutExpired:
        rc, tail = 124, "timeout"
    return {
        "gate": script.removesuffix(".py"),
        "ok": rc == 0,
        "seconds": round(time.perf_counter() - t0, 1),
        "last_line": tail[:200],
    }


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu-only", action="store_true",
                    help="skip the TPU-only kernel gates")
    ap.add_argument("--timeout", type=int, default=1200,
                    help="per-gate timeout (first TPU compile is slow)")
    args = ap.parse_args()

    results = [run_gate(s, cpu=True, timeout=args.timeout) for s in CPU_GATES]
    if not args.cpu_only:
        results += [
            run_gate(s, cpu=False, timeout=args.timeout) for s in TPU_GATES
        ]
    for r in results:
        print(f"# {'OK ' if r['ok'] else 'FAIL'} {r['gate']:24s} "
              f"{r['seconds']:7.1f}s  {r['last_line']}")
    ok = all(r["ok"] for r in results)
    print(json.dumps({
        "metric": "parity_gates_passed",
        "value": sum(r["ok"] for r in results),
        "unit": f"of {len(results)}",
        "ok": ok,
        "gates": {r["gate"]: r["ok"] for r in results},
    }))
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
