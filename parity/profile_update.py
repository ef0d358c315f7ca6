"""Sub-phase breakdown of the PPO update at config-5 shape: separately
times the minibatch gather, the loss forward, the grad, and one full
minibatch SGD step, on synthetic feature-major data — isolating where
update_epochs' 1.1 s actually goes (parity/profile_ppo.py only shows the
aggregate).

Usage:  python parity/profile_update.py [--envs 65536] [--ppt 5]
        [--steps 64] [--no-remat]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import optax

from gym_futbol_tpu import EnvParams
from gym_futbol_tpu import env as env_core
from gym_futbol_tpu.models.policy import ActorCritic, init_params
from gym_futbol_tpu.ppo import PPOConfig, make_optimizer, ppo_loss
from gym_futbol_tpu.utils.cache import enable_compilation_cache


def timed(label, fn, *args, iters=5):
    out = fn(*args)
    jax.device_get(jax.tree.leaves(out)[0])
    out = fn(*args)
    jax.device_get(jax.tree.leaves(out)[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.device_get(jax.tree.leaves(out)[0])
    dt = (time.perf_counter() - t0) / iters
    print(f"{label:>28}: {dt * 1e3:9.1f} ms", flush=True)
    return out, dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--envs", type=int, default=65536)
    ap.add_argument("--ppt", type=int, default=5)
    ap.add_argument("--steps", type=int, default=64)
    ap.add_argument("--no-remat", action="store_true")
    args = ap.parse_args()
    enable_compilation_cache()

    env_params = EnvParams(players_per_team=args.ppt)
    cfg = PPOConfig(rollout_steps=args.steps, remat=not args.no_remat)
    model = ActorCritic(n_players=env_params.players_per_team)
    tx = make_optimizer(cfg)
    f = env_core.obs_size(env_params)
    n = 2 * args.steps * args.envs
    mb = n // cfg.minibatches
    n_blocks = n // cfg.shuffle_block
    mb_blocks = n_blocks // cfg.minibatches
    print(f"# F={f} N={n} mb={mb} blocks={n_blocks}")

    key = jax.random.PRNGKey(0)
    params = init_params(key, model, env_params)
    opt_state = tx.init(params)

    ks = jax.random.split(key, 8)
    obs_blk = jax.random.normal(ks[0], (f, n_blocks, cfg.shuffle_block))
    dirs = jax.random.randint(ks[1], (mb,), 0, 2**15, dtype=jnp.int32)
    acts = jax.random.randint(ks[2], (mb,), 0, 2**15, dtype=jnp.int32)
    logp_old = -jnp.abs(jax.random.normal(ks[3], (mb,)))
    val_old = jax.random.normal(ks[4], (mb,))
    adv = jax.random.normal(ks[5], (mb,))
    ret = jax.random.normal(ks[6], (mb,))
    idx = jax.random.permutation(ks[7], n_blocks)[:mb_blocks]

    gather_sum = jax.jit(
        lambda blk, i: jnp.take(blk, i, axis=1).reshape(f, mb).sum()
    )
    timed("gather (sum-reduced)", gather_sum, obs_blk, idx)
    mb_obs = jax.jit(
        lambda blk, i: jnp.take(blk, i, axis=1).reshape(f, mb)
    )(obs_blk, idx)

    loss_fn = jax.jit(
        lambda p, o: ppo_loss(
            p, model, o, dirs, acts, logp_old, val_old, adv, ret, cfg
        )[0]
    )
    timed("loss forward", loss_fn, params, mb_obs)

    grad_fn = jax.jit(
        lambda p, o: jax.grad(
            lambda pp: ppo_loss(
                pp, model, o, dirs, acts, logp_old, val_old, adv, ret, cfg
            )[0]
        )(p)
    )
    timed("loss grad", grad_fn, params, mb_obs)

    def sgd_step(p, o_state, blk, i):
        o = jnp.take(blk, i, axis=1).reshape(f, mb)
        g = jax.grad(
            lambda pp: ppo_loss(
                pp, model, o, dirs, acts, logp_old, val_old, adv, ret, cfg
            )[0]
        )(p)
        upd, o_state = tx.update(g, o_state, p)
        return optax.apply_updates(p, upd), o_state

    step = jax.jit(sgd_step)
    timed("full minibatch SGD step", step, params, opt_state, obs_blk, idx)
    total = cfg.epochs * cfg.minibatches
    print(f"# x{total} minibatch steps/iteration")




def profile_fused(args):
    """Time the Pallas fused-update kernel at the same shape."""
    from gym_futbol_tpu.ops.fused_collect import flatten_actor_critic
    from gym_futbol_tpu.ops.fused_update import fused_minibatch_grad

    env_params = EnvParams(players_per_team=args.ppt)
    cfg = PPOConfig(rollout_steps=args.steps)
    model = ActorCritic(n_players=env_params.players_per_team)
    f = env_core.obs_size(env_params)
    n = 2 * args.steps * args.envs
    block = cfg.shuffle_block
    n_blocks = n // block
    mb_blocks = n_blocks // cfg.minibatches
    key = jax.random.PRNGKey(0)
    params = init_params(key, model, env_params)
    w = flatten_actor_critic(params, model)
    ks = jax.random.split(key, 8)
    f_pad = -(-f // 8) * 8  # fused-collect obs row padding contract
    obs_blk = jax.random.normal(ks[0], (f_pad, n_blocks * block))
    pk = lambda k: (jax.random.randint(k, (n_blocks, block), 0, 5,
                                       jnp.int32)
                    | (jax.random.randint(k, (n_blocks, block), 0, 5,
                                          jnp.int32) << 3))
    dirs, acts = pk(ks[1]), pk(ks[2])
    logp = -jnp.abs(jax.random.normal(ks[3], (n_blocks, block)))
    val = jax.random.normal(ks[4], (n_blocks, block))
    ret = jax.random.normal(ks[5], (n_blocks, block))
    adv_n = jax.random.normal(ks[6], (mb_blocks, block))
    idx = jax.random.permutation(ks[7], n_blocks)[:mb_blocks].astype(
        jnp.int32)

    grad_k = jax.jit(lambda *a: fused_minibatch_grad(
        *a, n_torso=len(model.hidden), clip_eps=cfg.clip_eps,
        vf_coef=cfg.vf_coef, ent_coef=cfg.ent_coef, block=block,
    )[0][0].sum())
    timed("FUSED minibatch grad", grad_k, w, obs_blk, dirs, acts, logp,
          val, ret, adv_n, idx)


if __name__ == "__main__":
    if "--fused" in sys.argv:
        sys.argv.remove("--fused")
        import argparse as _ap
        p = _ap.ArgumentParser()
        p.add_argument("--envs", type=int, default=65536)
        p.add_argument("--ppt", type=int, default=5)
        p.add_argument("--steps", type=int, default=64)
        profile_fused(p.parse_args())
    else:
        main()
