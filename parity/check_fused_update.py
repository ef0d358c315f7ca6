"""On-chip parity of the Pallas fused PPO-update kernel
(ops/fused_update.py) against jax.grad(ppo_loss).

Two checks on a realistic 2v2 shape (same minibatch composition logic as
update_epochs_fused):

1. compute_dtype=float32: kernel grads must match jax.grad leaf-for-leaf
   at ~1e-4 relative (same math, hand-written backward; residual is MXU
   f32 pass ordering).
2. compute_dtype=bfloat16 (the production config): cosine similarity of
   every gradient leaf vs the f32 reference must exceed 0.999 and
   relative L2 error stay under 2% — what the optimizer actually
   consumes.

Run (TPU):  python parity/check_fused_update.py
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from gym_futbol_tpu import EnvParams  # noqa: E402
from gym_futbol_tpu import env as env_core  # noqa: E402
from gym_futbol_tpu.models.policy import ActorCritic, init_params  # noqa: E402
from gym_futbol_tpu.ops.fused_collect import flatten_actor_critic  # noqa: E402
from gym_futbol_tpu.ops.fused_update import (  # noqa: E402
    fused_minibatch_grad,
    unflatten_actor_critic,
)
from gym_futbol_tpu.ppo import PPOConfig, ppo_loss  # noqa: E402
from gym_futbol_tpu.utils.cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()


def main() -> int:
    env_params = EnvParams(players_per_team=2)
    cfg = PPOConfig()
    model = ActorCritic(n_players=env_params.players_per_team)
    f = env_core.obs_size(env_params)
    f_pad = -(-f // 8) * 8   # kernel contract: obs rows tile-aligned
    block = 1024
    n_blocks, mb_blocks = 16, 8
    key = jax.random.PRNGKey(11)
    params = init_params(key, model, env_params)
    w = flatten_actor_critic(params, model)
    ks = jax.random.split(key, 9)
    pk = lambda k: (jax.random.randint(k, (n_blocks, block), 0, 5,
                                       jnp.int32)
                    | (jax.random.randint(jax.random.fold_in(k, 1),
                                          (n_blocks, block), 0, 5,
                                          jnp.int32) << 3))
    # pad rows carry random values: the wrapper zero-pads W1, so they
    # must contribute nothing (checked implicitly by the grad match)
    obs_fm = jax.random.normal(ks[0], (f_pad, n_blocks * block))
    dirs, acts = pk(ks[1]), pk(ks[2])
    logp = -jnp.abs(jax.random.normal(ks[3], (n_blocks, block)))
    val = jax.random.normal(ks[4], (n_blocks, block))
    ret = jax.random.normal(ks[5], (n_blocks, block))
    adv = jax.random.normal(ks[6], (n_blocks, block))
    idx = jax.random.permutation(ks[7], n_blocks)[:mb_blocks].astype(
        jnp.int32)

    adv_mb = jnp.take(adv, idx, axis=0)
    adv_n = (adv_mb - adv_mb.mean()) / (adv_mb.std() + 1e-8)
    take = lambda x: jnp.take(x, idx, axis=0).reshape(-1)
    mb_obs = jnp.take(obs_fm.reshape(f_pad, n_blocks, block), idx,
                      axis=1).reshape(f_pad, mb_blocks * block)
    # true-f32 reference: TPU default matmul is single-pass bf16, which
    # would blur the comparison by ~1e-2
    with jax.default_matmul_precision("highest"):
        ref_grads, ref_m = jax.grad(ppo_loss, has_aux=True)(
            params, model, mb_obs, take(dirs), take(acts), take(logp),
            take(val), take(adv), take(ret), cfg,
        )
    ref_leaves = jax.tree.leaves(jax.device_get(ref_grads))

    results = {}
    ok = True
    for dtype, name in ((jnp.float32, "f32"), (jnp.bfloat16, "bf16")):
        grads_flat, msums = fused_minibatch_grad(
            w, obs_fm, dirs, acts, logp, val, ret, adv_n, idx,
            n_torso=len(model.hidden), clip_eps=cfg.clip_eps,
            vf_coef=cfg.vf_coef, ent_coef=cfg.ent_coef, block=block,
            compute_dtype=dtype,
        )
        got = jax.tree.leaves(jax.device_get(
            unflatten_actor_critic(grads_flat, model)))
        worst_rel, worst_cos = 0.0, 1.0
        for a, b in zip(got, ref_leaves):
            a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
            rel = np.linalg.norm(a - b) / (np.linalg.norm(b) + 1e-30)
            cos = float((a * b).sum()
                        / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-30))
            worst_rel = max(worst_rel, float(rel))
            worst_cos = min(worst_cos, cos)
        inv_m = 1.0 / (mb_blocks * block)
        kl_err = abs(float(msums["approx_kl"]) * inv_m
                     - float(ref_m["approx_kl"]))
        results[name] = {"rel_l2": worst_rel, "cos": worst_cos,
                         "kl_err": kl_err}
        print(f"{name}: worst rel-L2 {worst_rel:.3e}  worst cos "
              f"{worst_cos:.6f}  approx_kl err {kl_err:.3e}")
        if name == "f32":
            ok &= worst_rel < 1e-4 and kl_err < 1e-5
        else:
            ok &= worst_cos > 0.999 and worst_rel < 0.02

    print(json.dumps({
        "metric": "fused_update_grad_parity",
        "value": results["f32"]["rel_l2"],
        "unit": "worst relative L2 vs jax.grad (f32 compute)",
        "ok": bool(ok),
        "bf16_cos": results["bf16"]["cos"],
    }))
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
