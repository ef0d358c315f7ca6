"""Physics parity harness: JAX engine (float64, CPU) vs the C++ oracle.

This is the framework's instantiation of BASELINE config 1's parity check
(SURVEY.md §4.2 item 1). The original target — goldens from the reference
itself — is blocked: the reference mount has been empty every session and
pymunk is not installed (SURVEY.md §0.1, §7.5), so no reference process
can run here. The normative spec in gym_futbol_tpu/physics.py therefore
serves as the contract, implemented twice (JAX + C++), and this harness
certifies the two agree to ~1e-9 in float64 over randomized trajectories,
including dense-contact regimes. When the mount populates, the same
harness structure takes reference-recorded .npz goldens instead.

Run:  JAX_ENABLE_X64=1 JAX_PLATFORMS=cpu python parity/check_physics_parity.py
Exits 0 on pass.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# CPU-only harness by definition (parity is certified on CPU x64 —
# BASELINE config 1); override any ambient accelerator platform.
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["JAX_ENABLE_X64"] = "1"

import jax  # noqa: E402
import numpy as np  # noqa: E402

from gym_futbol_tpu.physics import physics_step  # noqa: E402
from gym_futbol_tpu.utils.cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()
from gym_futbol_tpu.types import EnvParams  # noqa: E402
from native.build import load_oracle, oracle_physics_step  # noqa: E402


def run_case(lib, params: EnvParams, seed: int, n_steps: int,
             dense: bool) -> tuple[float, float]:
    """Roll n_steps from a random state. Returns (single_step_err, drift).

    single_step_err: both engines stepped from the SAME state each step
    (oracle state re-injected into JAX) — certifies the two spec
    implementations agree, with no chaotic amplification.
    drift: free-running trajectory divergence (informational — contact
    dynamics are chaotic, so compiler-level reassociation/FMA differences
    amplify exponentially; Chipmunk-vs-anything would behave identically).
    """
    rng = np.random.RandomState(seed)
    n = params.n_bodies
    if dense:
        # cluster all bodies in a small region: many simultaneous contacts
        center = np.asarray([params.width / 2, params.height / 2])
        pos = center + rng.randn(n, 2) * params.player_radius * 1.5
    else:
        pos = rng.rand(n, 2) * np.asarray([params.width, params.height])
    vel = rng.randn(n, 2) * 60.0
    forces = rng.randn(n, 2) * params.move_force
    forces[0] = 0.0

    # physics_step is module-level jit (params static): the compile cache
    # hits across seeds and across the lockstep/free-running loops below.
    step = lambda p, v: physics_step(p, v, forces, params)

    # --- lockstep single-step parity (the certification) ---
    opos, ovel = pos.copy(), vel.copy()
    step_err = 0.0
    for t in range(n_steps):
        jpos, jvel = step(opos, ovel)
        jpos, jvel = np.asarray(jpos), np.asarray(jvel)
        opos, ovel = oracle_physics_step(lib, opos, ovel, forces, params)
        step_err = max(
            step_err, np.abs(jpos - opos).max(), np.abs(jvel - ovel).max()
        )

    # --- free-running drift (informational) ---
    jpos, jvel = pos.copy(), vel.copy()
    opos, ovel = pos.copy(), vel.copy()
    for t in range(n_steps):
        jpos, jvel = step(jpos, jvel)
        opos, ovel = oracle_physics_step(lib, opos, ovel, forces, params)
    jpos, jvel = np.asarray(jpos), np.asarray(jvel)
    drift = max(np.abs(jpos - opos).max(), np.abs(jvel - ovel).max())
    return step_err, drift


def main() -> int:
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--exhaustive", action="store_true",
                    help="full body-count x seed matrix (the round-2 "
                         "default; ~5 min of x64 compiles + ctypes "
                         "round-trips). Default is a slimmed set chosen "
                         "so parity/run_all.py stays routinely runnable "
                         "(VERDICT r2 item 6); coverage is identical in "
                         "kind (free + dense-contact, small + max body "
                         "count), just fewer seeds/steps.")
    args = ap.parse_args()

    assert jax.config.jax_enable_x64, "x64 required for parity"
    lib = load_oracle()
    if args.exhaustive:
        cases = [
            ("1v1 free", EnvParams(players_per_team=1), False, 200, 3),
            ("2v2 free", EnvParams(players_per_team=2), False, 200, 3),
            ("2v2 dense-contact", EnvParams(players_per_team=2), True, 100, 3),
            ("3v3 dense-contact", EnvParams(players_per_team=3), True, 100, 3),
            ("5v5 dense-contact", EnvParams(players_per_team=5), True, 50, 3),
        ]
    else:
        cases = [
            ("1v1 free", EnvParams(players_per_team=1), False, 100, 2),
            ("2v2 dense-contact", EnvParams(players_per_team=2), True, 60, 2),
            ("5v5 dense-contact", EnvParams(players_per_team=5), True, 30, 1),
        ]
    failures = 0
    for name, params, dense, steps, seeds in cases:
        worst_step, worst_drift = 0.0, 0.0
        for seed in range(seeds):
            se, dr = run_case(lib, params, seed, steps, dense)
            worst_step = max(worst_step, se)
            worst_drift = max(worst_drift, dr)
        ok = worst_step < 1e-9
        if not ok:
            failures += 1
        print(f"{'OK ' if ok else 'FAIL'} {name}: single-step err "
              f"{worst_step:.3e} (gate 1e-9), {steps}-step free drift "
              f"{worst_drift:.3e} (informational)")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
