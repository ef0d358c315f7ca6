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

WEDGE DIAGNOSIS (VERDICT r4 weak #2): a TPU gate that exceeds a soft
per-gate threshold (default 420 s — several times any recorded warm
time) is probed live instead of silently running into the hard timeout:
a trivial ``jax.jit`` child is launched against the same device. If the
probe succeeds, the device and the remote-compile service are healthy,
so the stall is classified as a SUSPECTED CORRUPT COMPILE-CACHE ENTRY
(CLAUDE.md gotcha #5 — a process killed mid-write leaves an entry whose
load hangs the next reader); the gate is killed by exact PID and retried
ONCE with a fresh ``GFT_COMPILATION_CACHE``. If the probe also hangs,
the stall is an AXON REMOTE-COMPILE SERVICE WEDGE (environmental); the
gate is left to finish within the hard timeout and the classification is
attached to the result either way — a real kernel regression, a corrupt
cache, and a platform incident now produce three distinguishable
reports.

Prints one summary JSON object on the last line and exits nonzero if any
gate fails. Usage:

    python parity/run_all.py [--cpu-only] [--with-perf]
                             [--with-learning] [--full]
                             [--timeout SECONDS]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import tempfile
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
# (script, soft-watchdog seconds): thresholds sit well above each gate's
# legitimate COLD wall time (fresh compile chains through the remote
# compile service — the recurrent kernel alone is ~4 min), scaled by
# --soft-timeout/420. Observed r5: a 420 s blanket threshold killed a
# healthy cold recurrent gate.
TPU_GATES = [("check_fused_actor.py", 420),
             ("check_fused_collect.py", 600),
             ("check_fused_update.py", 600),
             ("check_fused_recurrent.py", 900)]


def _probe_trivial_jit(timeout: int = 240) -> bool:
    """CLAUDE.md gotcha #5 diagnosis step: does a trivial jit compile+run
    on the device right now? Uses its own throwaway compile cache so the
    probe can neither hit a corrupt entry nor write one."""
    env = child_env(tpu=True)
    env["GFT_COMPILATION_CACHE"] = tempfile.mkdtemp(prefix="gft_probe_")
    code = ("import jax; from gym_futbol_tpu.utils.cache import "
            "enable_compilation_cache; enable_compilation_cache(); "
            "jax.jit(lambda x: x + 1)(1.0); print('probe-ok')")
    try:
        p = subprocess.run(
            [sys.executable, "-c", code], env=env, capture_output=True,
            text=True, timeout=timeout,
            cwd=os.path.dirname(HERE),
        )
        return p.returncode == 0 and "probe-ok" in p.stdout
    except subprocess.TimeoutExpired:
        return False


def run_gate(script: str, cpu: bool, timeout: int,
             extra_args: list[str] | None = None,
             soft_timeout: int | None = None,
             cache_override: str | None = None) -> dict:
    env = child_env(tpu=not cpu)
    if cpu:
        env["JAX_PLATFORMS"] = "cpu"
    if cache_override is not None:
        env["GFT_COMPILATION_CACHE"] = cache_override
    t0 = time.perf_counter()
    diagnosis = None
    proc = subprocess.Popen(
        [sys.executable, os.path.join(HERE, script), *(extra_args or [])],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
    )
    # Stage 1: up to the soft threshold (or straight to the hard timeout
    # when no watchdog applies — CPU gates, long-run gates, retries).
    watch = (soft_timeout is not None and not cpu
             and cache_override is None and soft_timeout < timeout)
    try:
        out, err = proc.communicate(
            timeout=soft_timeout if watch else timeout
        )
        rc = proc.returncode
    except subprocess.TimeoutExpired:
        if not watch:
            proc.kill()
            out, err = proc.communicate()
            rc = 124
        else:
            # Soft threshold exceeded: classify before burning the rest
            # of the hard timeout (VERDICT r4 weak #2 / gotcha #5).
            print(f"# WATCHDOG {script}: exceeded soft {soft_timeout}s; "
                  f"probing device with a trivial jit...", flush=True)
            if _probe_trivial_jit():
                # Device + compile service healthy => the stalled gate is
                # the classic corrupt-persistent-cache-entry hang. Kill
                # the EXACT child PID and retry once on a fresh cache.
                proc.kill()
                proc.communicate()
                # The killed client's exclusive tunnel slot takes a while
                # to be reclaimed by the pool; a retry launched into that
                # window can wedge forever in device acquisition
                # (observed r5). Give the pool time to notice the death.
                time.sleep(45)
                fresh = tempfile.mkdtemp(prefix="gft_fresh_")
                print(f"# WATCHDOG {script}: probe OK => suspected "
                      f"corrupt compile-cache entry; retrying once with "
                      f"GFT_COMPILATION_CACHE={fresh} (consider purging "
                      f".jax_cache)", flush=True)
                rec = run_gate(script, cpu, timeout, extra_args,
                               cache_override=fresh)
                rec["diagnosis"] = (
                    f"soft-timeout {soft_timeout}s + healthy probe => "
                    "suspected corrupt compile-cache entry; retried on a "
                    "fresh cache"
                )
                rec["seconds"] = round(time.perf_counter() - t0, 1)
                return rec
            diagnosis = ("axon remote-compile service wedge (trivial-jit "
                         "probe also hung) — environmental, not a gate "
                         "regression")
            print(f"# WATCHDOG {script}: probe HUNG => {diagnosis}; "
                  f"waiting out the hard timeout", flush=True)
            try:
                out, err = proc.communicate(
                    timeout=max(timeout - soft_timeout, 60)
                )
                rc = proc.returncode
            except subprocess.TimeoutExpired:
                proc.kill()
                out, err = proc.communicate()
                rc = 124
    if rc == 124:
        tail = "timeout"
    else:
        tail = ((out or "").strip().splitlines() or [""])[-1]
        if rc != 0 and err:
            tail = err.strip().splitlines()[-1]
    rec = {
        "gate": script.removesuffix(".py"),
        "ok": rc == 0,
        "seconds": round(time.perf_counter() - t0, 1),
        "last_line": tail[:200],
    }
    if diagnosis:
        rec["diagnosis"] = diagnosis
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
    ap.add_argument("--full", action="store_true",
                    help="one-command full certification (VERDICT r4 weak "
                         "#4): both lanes + perf floors + the 2v2 "
                         "learning gate (= --with-perf --with-learning); "
                         "the ppt-3/5 flagship-scale learning gates stay "
                         "explicit (--learning-ppt)")
    ap.add_argument("--timeout", type=int, default=1800,
                    help="per-gate timeout (first TPU compile is slow)")
    ap.add_argument("--soft-timeout", type=int, default=420,
                    help="base kernel-gate watchdog threshold (each gate "
                         "has its own cold-wall-calibrated threshold, "
                         "scaled by this/420): past it, probe the device "
                         "and classify corrupt-cache vs service-wedge vs "
                         "real stall (0 disables)")
    args = ap.parse_args()
    if args.full:
        args.with_perf = True
        args.with_learning = True

    t_start = time.perf_counter()
    scale = args.soft_timeout / 420.0 if args.soft_timeout else None
    tpu_gates = [(s, None, int(st * scale) if scale else None)
                 for s, st in TPU_GATES]
    if args.with_perf:
        # perf/learning gates legitimately run long (multi-config bench,
        # multi-seed training) — no watchdog, hard timeout only
        tpu_gates.append(("check_perf.py", None, None))
    if args.with_learning:
        tpu_gates.append(
            ("check_learning.py", ["--ppt", str(args.learning_ppt)], None)
        )

    def tpu_lane() -> list[dict]:
        return [run_gate(s, cpu=False, timeout=args.timeout, extra_args=a,
                         soft_timeout=st)
                for s, a, st in tpu_gates]

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
    if args.full:
        verdict = "CERTIFIED" if ok else "FAILED"
        print(f"# FULL CERTIFICATION {verdict}: "
              f"{sum(r['ok'] for r in results)}/{len(results)} gates "
              f"(oracle parity + fused kernels + perf floors + "
              f"ppt-{args.learning_ppt} learning) in "
              f"{time.perf_counter() - t_start:.0f}s"
              + (f"; not run: {'; '.join(skipped)}" if skipped else ""),
              flush=True)
    print(json.dumps({
        "metric": "parity_gates_passed",
        "value": sum(r["ok"] for r in results),
        "unit": f"of {len(results)}",
        "ok": ok,
        "gates": {r["gate"]: r["ok"] for r in results},
        "diagnoses": {r["gate"]: r["diagnosis"] for r in results
                      if r.get("diagnosis")},
        "skipped": skipped,
        "wall_seconds": round(time.perf_counter() - t_start, 1),
    }))
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
