"""TPU performance-regression gate (VERDICT r2 item 5; SURVEY.md §4.2
item 5 "benchmarks as tests, with regression thresholds").

Runs the headline bench configs with hard floors — one subprocess per
config so each gets a clean device — and emits one summary JSON line,
exiting nonzero if ANY config regresses below its floor. Floors are set
at ~70-75% of the numbers measured on the v5e in BASELINE.md, far above
noise but low enough to only trip on real kernel/layout regressions.

Run (TPU):  python parity/check_perf.py [--quick]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, HERE)

from _tunnel import child_env, ensure_parent_unregistered  # noqa: E402

# This parent is a pure-CPU orchestrator whose CHILDREN are the TPU
# clients; a tunnel-registered parent blocks its own children's device
# acquisition (parity/_tunnel.py docstring).
ensure_parent_unregistered()

BENCH = os.path.join(os.path.dirname(HERE), "bench.py")

# (config, floor steps/s, measured-on-v5e reference from BASELINE.md).
# Every NAMED BASELINE config is gated (config-4 floor: VERDICT r3 weak
# #2); round-over-round measured history lives in BASELINE.md so slow
# drift is visible before it reaches a floor. Floors recalibrated at r5
# to 70-73% of the iters=10 measurements (VERDICT r4 weak #1 — the r4
# floors tracked the retired iters=3 methodology, silently widening the
# regression margin to ~60%).
FLOORS = [
    (2, 11.5e6, "16.6M small-batch fused rollout, 256 envs "
                 "(r5, iters=40 — at iters=10 the ~10ms iterations read "
                 "8-13M with 1.7x spread)"),
    (3, 55e6, "76.3M fused rollout (r5, iters=10)"),
    (4, 28e6, "39.7M 3v3 PPO collect+GAE (r5)"),
    (6, 43e6, "59.3M policy-in-kernel self-play (r5)"),
    (5, 6.8e6, "9.46M full 5v5 PPO iteration (fused update, r5)"),
]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true",
                    help="1 timed iteration per config instead of 3")
    ap.add_argument("--timeout", type=int, default=3000)
    args = ap.parse_args()

    results = []
    for config, floor, note in FLOORS:
        cmd = [sys.executable, BENCH, "--config", str(config),
               "--assert-floor", str(floor)]
        if args.quick:
            cmd += ["--iters", "1"]
        t0 = time.perf_counter()
        try:
            proc = subprocess.run(cmd, capture_output=True, text=True,
                                  timeout=args.timeout,
                                  env=child_env(tpu=True))
            last = (proc.stdout.strip().splitlines() or ["{}"])[-1]
            try:
                rec = json.loads(last)
            except json.JSONDecodeError:
                rec = {"ok": False, "error": last[:200]}
            rec["config"] = config
            rec["ok"] = bool(rec.get("ok", proc.returncode == 0))
            if proc.returncode != 0 and proc.stderr and not rec.get("ok"):
                rec.setdefault(
                    "error", proc.stderr.strip().splitlines()[-1][:200]
                )
        except subprocess.TimeoutExpired:
            rec = {"config": config, "ok": False, "error": "timeout"}
        rec["seconds"] = round(time.perf_counter() - t0, 1)
        results.append(rec)
        status = "OK " if rec["ok"] else "FAIL"
        print(f"# {status} config {config}: "
              f"{rec.get('value', 0) / 1e6:8.2f}M steps/s "
              f"(floor {floor / 1e6:.0f}M, ref {note}) "
              f"{rec['seconds']:6.1f}s", flush=True)

    ok = all(r["ok"] for r in results)
    print(json.dumps({
        "metric": "perf_floors_passed",
        "value": sum(r["ok"] for r in results),
        "unit": f"of {len(results)} configs",
        "ok": ok,
        "configs": {str(r["config"]): r.get("value") for r in results},
    }))
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
