"""TPU-tunnel hygiene for ORCHESTRATOR scripts.

The axon ``sitecustomize`` registers the TPU tunnel in EVERY python
process whose ``PALLAS_AXON_POOL_IPS`` is non-empty. The tunnel slot is
exclusive while a client holds the device (CLAUDE.md environment
gotcha #1), and registration itself costs 50-110 s per process when the
pool is cold. Orchestrators (check_perf, run_all) are pure-CPU parents
whose CHILDREN are the real TPU clients — the parent registering is at
best wasted startup and at worst a live slot-holder racing its own
children. Registration happens before user code runs (sitecustomize),
so the clean fix is to re-exec the parent once with
``PALLAS_AXON_POOL_IPS=''`` (registration skipped entirely), stashing
the original value so spawned TPU children get the real tunnel back.

Debugging note (2026-08-20 incident, root-caused): a child bench
sitting at ~0 CPU for many minutes with ``jax.devices()`` instant from
other processes is NOT this gotcha — it was a CORRUPT PERSISTENT
COMPILE CACHE entry (a process killed mid-write leaves an entry whose
load hangs the next reader of that program; other programs compile
fine). Confirm with ``GFT_COMPILATION_CACHE=/tmp/fresh`` and purge
``.jax_cache``. If a trivial ``jax.jit`` hangs from every process, it
is the remote-compile service instead — wait it out.

Call :func:`ensure_parent_unregistered` as the FIRST import-time action;
use :func:`child_env` when building subprocess environments.
"""

from __future__ import annotations

import os
import sys

_STASH = "_AXON_POOL_IPS_FOR_CHILDREN"
_FLAG = "_TUNNEL_GUARD_REEXECED"


def ensure_parent_unregistered() -> None:
    """Re-exec the current process with tunnel registration disabled
    (no-op if already disabled or already re-exec'd)."""
    if os.environ.get(_FLAG) == "1":
        return
    if os.environ.get("PALLAS_AXON_POOL_IPS", "x") == "":
        return  # launched with the empty override; nothing registered
    env = dict(os.environ)
    env[_STASH] = env.get("PALLAS_AXON_POOL_IPS", "")
    env["PALLAS_AXON_POOL_IPS"] = ""
    env[_FLAG] = "1"
    os.execve(sys.executable, [sys.executable] + sys.argv, env)


def child_env(tpu: bool) -> dict:
    """Environment for a child: TPU children get the stashed tunnel
    address back; CPU children keep registration disabled."""
    env = dict(os.environ)
    if tpu:
        stashed = env.pop(_STASH, None)
        if stashed is not None:
            env["PALLAS_AXON_POOL_IPS"] = stashed
        # else: the operator launched the parent with the empty override
        # and there is nothing to restore — TPU children will fail fast
        # on a CPU-only tunnel instead of hanging, which is the right
        # failure mode for a --cpu-only-style launch.
    else:
        env["PALLAS_AXON_POOL_IPS"] = ""
    env.pop(_FLAG, None)
    return env
