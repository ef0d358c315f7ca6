"""Policy-in-kernel self-play rollout vs the jnp evaluate() path.

Runs the SAME per-team MLP weights through (a) the jnp joint-policy
evaluation (evaluate.py: mirror_obs, inverse-CDF sampling) and (b) the
fused Pallas kernel (ops/fused_actor.py). The RNG streams differ by
design (jax.random vs on-core PRNG), so the check is statistical:
aggregate match statistics over many envs/steps must agree within
sampling error. Requires a real TPU (the kernel uses the core PRNG).

Run:  python parity/check_fused_actor.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from gym_futbol_tpu import EnvParams  # noqa: E402
from gym_futbol_tpu.evaluate import evaluate  # noqa: E402
from gym_futbol_tpu.ops import pack_state  # noqa: E402
from gym_futbol_tpu.ops.fused_actor import (  # noqa: E402
    fused_selfplay_rollout,
    init_mlp,
    mlp_team_policy,
)
from gym_futbol_tpu.utils.cache import enable_compilation_cache  # noqa: E402
from gym_futbol_tpu.vector import reset_batch  # noqa: E402

enable_compilation_cache()


def main() -> int:
    params = EnvParams(players_per_team=2)
    B, T = 4096, 600
    wa = init_mlp(jax.random.PRNGKey(1), params)
    wb = init_mlp(jax.random.PRNGKey(2), params)

    # jnp path
    ref = evaluate(
        params,
        policy_a=mlp_team_policy(wa, params),
        policy_b=mlp_team_policy(wb, params),
        n_envs=B, n_steps=T, seed=0,
    )

    # fused kernel path
    state, _ = reset_batch(jax.random.PRNGKey(0), params, B)
    sf, si = pack_state(state, params)
    sf, si, rew, goals = fused_selfplay_rollout(
        sf, si, wa, wb, jnp.asarray([7], jnp.int32), params, n_steps=T
    )
    rew = np.asarray(jax.device_get(rew))
    goals = np.asarray(jax.device_get(goals))

    ref_mean = float(ref["mean_team0_reward"])
    got_mean = float(rew.mean())
    ref_goal_rate = float((ref["goals"][0] + ref["goals"][1]) / (B * T))
    got_goal_rate = float(goals.sum() / (B * T))

    print(f"mean team0 reward: jnp {ref_mean:+.5f}  kernel {got_mean:+.5f}")
    print(f"goal rate/step:    jnp {ref_goal_rate:.6f}  kernel {got_goal_rate:.6f}")

    ok = True
    # Means are small (~1e-3..1e-2); require agreement within 3 combined
    # standard errors estimated from the kernel sample.
    se = rew.std() / np.sqrt(rew.size) * np.sqrt(2.0)
    if abs(ref_mean - got_mean) > 5 * se + 1e-4:
        print(f"FAIL reward means differ beyond noise (se~{se:.2e})")
        ok = False
    if not (0.5 < (got_goal_rate + 1e-9) / (ref_goal_rate + 1e-9) < 2.0):
        print("FAIL goal rates differ by more than 2x")
        ok = False
    print("OK" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
