"""TPU gate for the fused RECURRENT (LSTM-in-kernel) collect.

Certifies, on the real chip (Mosaic, not interpret mode), that
``ops.fused_recurrent.fused_recurrent_collect`` is internally consistent
with the flax :class:`RecurrentActorCritic`: re-running the flax model
over the kernel's own emitted obs from the rollout's initial carry
(resetting at the kernel's dones) reproduces the kernel's value, the
log-prob of its taken actions, and its final carry to float32 roundoff.
This is exactly the recomputation the BPTT update
(``a2c.recurrent_a2c_loss``) performs, so passing = the on-policy
contract of the fused recurrent path holds end-to-end.

Also times the fused vs jnp recurrent collect at a training-shaped
config and runs one fused train iteration (finite loss).

Run (TPU):  python parity/check_fused_recurrent.py
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from gym_futbol_tpu.utils.cache import enable_compilation_cache

# The fused recurrent kernel is the slowest Mosaic compile in the repo
# (~4 min fresh through the remote-compile service); without the
# persistent cache every gate run pays it again — and looks
# indistinguishable from a stall to run_all's watchdog.
enable_compilation_cache()

from gym_futbol_tpu import a2c
from gym_futbol_tpu import env as env_core
from gym_futbol_tpu.models.policy import action_log_prob_and_entropy_packed
from gym_futbol_tpu.models.recurrent import (
    RecurrentActorCritic,
    init_recurrent_params,
    reset_carry_where_done,
)
from gym_futbol_tpu.ops import pack_state
from gym_futbol_tpu.ops.fused_recurrent import (
    flatten_recurrent_actor_critic,
    fused_recurrent_collect,
)
from gym_futbol_tpu.vector import reset_batch

TOL = 5e-5       # logp + carry: f32 roundoff (measured bitwise on-chip)
TOL_VALUE = 5e-3  # value head: the kernel's degenerate [H, 1] dot lowers
# as an exact f32 broadcast-reduce (Mosaic; CLAUDE.md "degenerate dots")
# while the flax replay's [2B, H] @ [H, 1] rounds through the MXU's
# single-pass bf16 — the ~1e-3 gap is the REPLAY's rounding, and the
# kernel side is the more accurate of the two.


def main() -> int:
    p = env_core.EnvParams(players_per_team=2, max_steps=16)
    H = 128
    m = RecurrentActorCritic(n_players=2, hidden=(128,), lstm_size=H)
    v = init_recurrent_params(jax.random.PRNGKey(0), m, p)
    w = flatten_recurrent_actor_critic(v, m)

    B, T = 2048, 24
    st, _ = reset_batch(jax.random.PRNGKey(1), p, B)
    sf, si = pack_state(st, p)
    nb = B // 128
    cc = jnp.zeros((2, H, nb, 128), jnp.float32)
    hh = jnp.zeros((2, H, nb, 128), jnp.float32)
    (sf2, si2, obs, dirs, acts, logp, value, reward, done, last_v,
     cc2, hh2) = fused_recurrent_collect(
        sf, si, w, cc, hh, jnp.asarray([7], jnp.int32), p, T,
        hidden=(128,), lstm_size=H, block=1024,
    )
    obs, dirs, acts, logp, value, done, cc2, hh2 = jax.device_get(
        (obs, dirs, acts, logp, value, done, cc2, hh2)
    )

    n_feat = env_core.obs_size(p)
    obs_tm = jnp.transpose(
        jnp.asarray(obs).reshape(2, obs.shape[1], T, B)[:, :n_feat],
        (2, 0, 3, 1),
    ).reshape(T, 2 * B, n_feat)
    carry = (jnp.zeros((2 * B, H)), jnp.zeros((2 * B, H)))
    max_v = max_lp = 0.0
    n_dones = int(jnp.asarray(done).sum())
    for t in range(T):
        carry, (logits, val) = m.apply(v, carry, obs_tm[t])
        lp, _ = action_log_prob_and_entropy_packed(
            logits,
            jnp.asarray(dirs)[t].reshape(2 * B),
            jnp.asarray(acts)[t].reshape(2 * B),
        )
        d = jnp.asarray(done)[t].reshape(2 * B).astype(bool)
        carry = reset_carry_where_done(carry, d)
        max_v = max(max_v, float(jnp.max(jnp.abs(
            val - jnp.asarray(value)[t].reshape(2 * B)))))
        max_lp = max(max_lp, float(jnp.max(jnp.abs(
            lp - jnp.asarray(logp)[t].reshape(2 * B)))))
    cc2_tm = jnp.swapaxes(jnp.asarray(cc2).reshape(2, H, B), 1, 2).reshape(
        2 * B, H
    )
    hh2_tm = jnp.swapaxes(jnp.asarray(hh2).reshape(2, H, B), 1, 2).reshape(
        2 * B, H
    )
    max_c = float(jnp.max(jnp.abs(carry[0] - cc2_tm)))
    max_h = float(jnp.max(jnp.abs(carry[1] - hh2_tm)))
    print(f"flax replay over kernel trajectory ({n_dones} dones): "
          f"value {max_v:.3e} (tol {TOL_VALUE:.0e})  logp {max_lp:.3e}  "
          f"carry c {max_c:.3e} h {max_h:.3e}  (tol {TOL:.0e})")
    ok = (max(max_lp, max_c, max_h) <= TOL and max_v <= TOL_VALUE
          and n_dones > 0)

    # one fused train iteration on-chip + fused-vs-jnp collect timing
    cfg = a2c.A2CConfig(rollout_steps=16)
    tx = a2c.make_optimizer(cfg)
    runner = a2c.init_recurrent_runner(
        jax.random.PRNGKey(3), m, p, cfg, 8192, tx
    )
    step_fused = functools.partial(
        a2c.train_iteration_recurrent, collect_fn=
        a2c.collect_recurrent_rollout_fused,
    )
    runner, metrics = step_fused(runner, m, p, cfg, tx)
    loss = float(metrics["loss"])
    print(f"fused recurrent train iteration: loss {loss:.4f}")
    ok = ok and bool(jnp.isfinite(loss))

    def time_collect(fn, runner):
        # jit the WHOLE collect (glue included) — matches how training
        # consumes it (train_iteration_recurrent is one jitted function);
        # eager per-op dispatch through the axon tunnel would otherwise
        # dominate the measurement. n=20: the per-batch fixed cost
        # (dispatch pipelining + final tunnel sync) is ~tens of ms — at
        # n=5 it dominated the ~4-6 ms/iter compute and under-read BOTH
        # paths 5-7x with 3x run-to-run noise (r5 root-cause of the
        # retired "fused is 0.55x of jnp" claim; BASELINE.md session 8).
        jfn = jax.jit(lambda r: fn(r, m, p, cfg))
        runner2, traj, lv = jfn(runner)              # compile
        jax.device_get(jnp.sum(lv))
        for _ in range(2):                           # warm twice (axon)
            runner2, traj, lv = jfn(runner2)
        jax.device_get(jnp.sum(lv))
        t0 = time.perf_counter()
        n = 20
        for _ in range(n):
            runner2, traj, lv = jfn(runner2)
        jax.device_get(jnp.sum(lv))
        dt = (time.perf_counter() - t0) / n
        return 8192 * cfg.rollout_steps / dt

    sps_fused = time_collect(a2c.collect_recurrent_rollout_fused, runner)
    sps_jnp = time_collect(a2c.collect_recurrent_rollout, runner)
    print(f"recurrent collect steps/s: fused {sps_fused/1e6:.2f}M  "
          f"jnp {sps_jnp/1e6:.2f}M  ({sps_fused/sps_jnp:.2f}x)")

    print(json.dumps({
        "metric": "fused_recurrent_consistency",
        "value": max(max_v, max_lp, max_c, max_h),
        "unit": f"worst abs err vs flax replay (tol {TOL} / "
                f"value-head {TOL_VALUE})",
        "ok": bool(ok),
        "fused_steps_per_sec": sps_fused,
        "jnp_steps_per_sec": sps_jnp,
    }))
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
