"""Fused SELF-PLAY PPO experience collection: per-team actor-critic
in-kernel.

One Mosaic kernel runs the whole T-step PPO rollout — the per-TEAM
ActorCritic forward on BOTH views (the true team-0 view and the mirrored
team-1 view; MXU matmuls over [feature, block] matrices), action sampling
+ joint log-prob per view (row form, on-core PRNG), the full env step
driven by both teams' sampled actions, and auto-reset — and emits exactly
what the self-play PPO update consumes (see ppo.collect_rollout: rows are
perspectives; view 0 = team 0, view 1 = team 1 in its mirrored frame):

    obs    [2, F_pad, T, B//128, 128] f32  (streamed to HBM per step via
                                        DMA; F_pad = F rounded up to a
                                        multiple of 8, pad rows ZERO)
    dirs   [T, 2, B//128, 128] i32     (bit-packed, 3 bits/player,
                                        view 1 in the MIRRORED frame)
    acts   [T, 2, B//128, 128] i32
    logp   [T, 2, B//128, 128] f32
    value  [T, 2, B//128, 128] f32
    reward [T, 2, B//128, 128] f32     (view k carries team k's reward)
    done   [T, 2, B//128, 128] i32
    last_value [2, B//128, 128] f32    (bootstrap for GAE, both views)

The obs layout is FEATURE-MAJOR with (view, step, env) as the flattened
sample axis: ``obs.reshape(2, F, T*B)`` then a cheap [2, F, M] ->
[F, 2, M] relayout gives the exact [F, N] matrix the feature-major PPO
update consumes (ppo.update_epochs) — every Dense in the update is then
an MXU contraction with samples on the lane axis and NO transpose of the
multi-GB buffer ever happens (the round-2 layout emitted [T, 2, F, nb,
128] and ppo.py paid a 4-byte-element swapaxes into row-major [T, 2B, F]
only for the update to prefer feature-major after all).

EVERY per-step trajectory row — the observation block (~200-400 KB) and
the six small [2, block] rows (logp/value/reward f32, dirs/acts/done
i32) — is written to its HBM output with ``pltpu.make_async_copy`` from
a VMEM scratch; only the env state and the weights stay VMEM-resident.
Keeping the [T, ...] buffers out of VMEM is what lets ``block`` satisfy
Mosaic's tiling constraint — a multiple of 1024 (sublane dim block//128 a
multiple of 8) OR the whole per-shard env count (whole-array relaxation)
— for ANY rollout length T: the earlier design held the whole
[T, 2, sub, 128] trajectory in VMEM, which at T=128 forced block=512 and
failed Mosaic's tiling check — silently dropping configs 4-5 onto the
slow jnp collect path. The constraint is asserted in
:func:`fused_collect`.

RNG: the on-core PRNG (sampling stream differs from jax.random by
design; the PPO update recomputes log-probs from the SAME obs/actions
with the SAME weights, so the on-policy contract holds — certified by
parity/check_fused_collect.py, which checks the kernel's own outputs are
internally consistent with the flax model to float32 roundoff).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..types import EnvParams
from .fused_actor import _mlp_logit_rows, _obs_matrix, _unmirror_dir, N_CHOICES
from .fused_rollout import (
    _LANE,
    _fused_step,
    _normal,
    _read_state,
    _uniform01,
    _uniform_pm1,
    _write_state,
)


def flatten_actor_critic(variables, model) -> tuple:
    """Flax ActorCritic variables -> flat (W, b) tuple in kernel order:
    torso Denses, logits Dense, value Dense. Biases reshaped [out, 1]."""
    dense = variables["params"]
    n_dense = len(model.hidden) + 2
    out = []
    for i in range(n_dense):
        layer = dense[f"Dense_{i}"]
        out.append(jnp.asarray(layer["kernel"], jnp.float32))
        out.append(jnp.asarray(layer["bias"], jnp.float32).reshape(-1, 1))
    return tuple(out)


def actor_critic_policy_weights(variables, model) -> tuple:
    """Adapter (VERDICT r2 item 3): trained flax ActorCritic params ->
    the POLICY-ONLY flat (W1, b1, ..., Wl, bl) tuple that
    ``ops.fused_actor.fused_selfplay_rollout`` / ``evaluate.evaluate_fused``
    accept — i.e. :func:`flatten_actor_critic` minus the value head.

    The fused actor kernel's MLP (``_mlp_logit_rows``) applies tanh
    between layers and none after the last, exactly matching the
    ActorCritic torso + logits head, so a PPO-trained policy evaluates
    on the ~43M steps/s policy-in-kernel path bit-identically in
    distribution to ``model.apply`` + ``sample_actions`` (certified by
    parity/check_fused_actor.py's jnp twin and the trained-adapter
    consistency check in parity/check_learning.py)."""
    return flatten_actor_critic(variables, model)[:-2]


def _sample_with_logp(logit_rows, n_groups: int, block: int, sub: int,
                      uniform=None):
    """Row-form inverse-CDF sampling + joint taken log-prob.
    Returns (idx tiles [(sub,128)]*G, joint logp [block]).

    ``uniform`` optionally injects the per-group uniform source (a
    zero-arg callable returning an (sub, 128) draw) — the seed-table
    interpret path of ops/fused_recurrent.py; defaults to the on-core
    PRNG."""
    draw = uniform or (lambda: _uniform01((sub, _LANE)))
    idxs, logp_total = [], None
    for g in range(n_groups):
        rows = [logit_rows[g * N_CHOICES + i] for i in range(N_CHOICES)]
        m = rows[0]
        for r in rows[1:]:
            m = jnp.maximum(m, r)
        exps = [jnp.exp(r - m) for r in rows]
        z = exps[0]
        for e in exps[1:]:
            z = z + e
        logz = jnp.log(z)
        logps = [r - m - logz for r in rows]
        u = draw().reshape(block) * z
        cum = exps[0]
        idx = (u > cum).astype(jnp.int32)
        for i in range(1, N_CHOICES - 1):
            cum = cum + exps[i]
            idx = idx + (u > cum).astype(jnp.int32)
        taken = logps[0]
        for i in range(1, N_CHOICES):
            taken = jnp.where(idx == i, logps[i], taken)
        idxs.append(idx.reshape(sub, _LANE))
        logp_total = taken if logp_total is None else logp_total + taken
    return idxs, logp_total


def _collect_kernel(params: EnvParams, n_steps: int, sub: int,
                    n_dense: int):
    n = params.n_bodies
    ppt = params.players_per_team
    block = sub * _LANE
    shape = (sub, _LANE)
    f_dim = 4 * n + 2
    f_pad = -(-f_dim // 8) * 8  # feature rows padded with zeros so the
    # [F_pad, N] buffer's sublane dim is tile-aligned for the fused
    # update kernel's DMA slabs (ops/fused_update.py)

    def kernel(seed_ref, *refs):
        w = [refs[i] for i in range(2 * n_dense)]
        sf_ref, si_ref = refs[2 * n_dense], refs[2 * n_dense + 1]
        (out_sf, out_si, obs_hbm, miscf_hbm, misci_hbm,
         lastv_ref) = refs[2 * n_dense + 2:2 * n_dense + 8]
        (obs_scratch, miscf_scratch, misci_scratch, obs_sem, miscf_sem,
         misci_sem) = refs[2 * n_dense + 8:2 * n_dense + 14]

        pltpu.prng_seed(seed_ref[0] + pl.program_id(0) * 0x27D4EB2F)
        torso = [w[i][:] for i in range(2 * (n_dense - 2))]
        wl, bl = w[-4][:], w[-3][:]
        wv, bv = w[-2][:], w[-1][:]
        state = _read_state(sf_ref, si_ref, n)
        blk = pl.program_id(0)

        def forward(px, py, vx, vy, poss, mirror):
            x = _obs_matrix(px, py, vx, vy, poss, params, mirror, block)
            h = _mlp_logit_rows(x, torso, block)
            h = jnp.tanh(h)  # torso layers end with tanh (ActorCritic)
            logits = jax.lax.dot_general(
                wl, h, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) + bl
            value = (jax.lax.dot_general(
                wv, h, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) + bv).reshape(block)
            return x, logits, value

        def misc_dmas(step):
            return (
                pltpu.make_async_copy(
                    miscf_scratch,
                    miscf_hbm.at[step, :, :, pl.ds(blk * sub, sub), :],
                    miscf_sem,
                ),
                pltpu.make_async_copy(
                    misci_scratch,
                    misci_hbm.at[step, :, :, pl.ds(blk * sub, sub), :],
                    misci_sem,
                ),
            )

        def body(step_i, carry):
            px, py, vx, vy, poss, s0, s1, t = (
                list(carry[0]), list(carry[1]), list(carry[2]),
                list(carry[3]), carry[4], carry[5], carry[6], carry[7],
            )
            # per-team policy on both views (view 1 = mirrored team-1)
            xa, la, va = forward(px, py, vx, vy, poss, False)
            xb, lb, vb = forward(px, py, vx, vy, poss, True)

            # stream this step's two obs blocks to HBM in one DMA
            # (zero rows pad F to the tile-aligned F_pad)
            zpad = jnp.zeros((f_pad - f_dim, block), jnp.float32)
            xa = jnp.concatenate([xa, zpad], axis=0)
            xb = jnp.concatenate([xb, zpad], axis=0)
            obs_scratch[0] = xa.reshape(f_pad, sub, _LANE)
            obs_scratch[1] = xb.reshape(f_pad, sub, _LANE)
            dma = pltpu.make_async_copy(
                obs_scratch,
                obs_hbm.at[:, :, step_i, pl.ds(blk * sub, sub), :],
                obs_sem,
            )
            dma.start()

            ia, logp_a = _sample_with_logp(la, 2 * ppt, block, sub)
            ib, logp_b = _sample_with_logp(lb, 2 * ppt, block, sub)
            # world-frame joint action: team 0 as sampled, team 1's
            # directions un-mirrored (evaluate.joint_policy semantics)
            dirs = [ia[2 * p] for p in range(ppt)]
            dirs += [_unmirror_dir(ib[2 * p]) for p in range(ppt)]
            acts = [ia[2 * p + 1] for p in range(ppt)]
            acts += [ib[2 * p + 1] for p in range(ppt)]
            # packed actions per view, each in ITS OWN frame (the frame
            # its logits/logp live in — what the PPO update recomputes)
            dpack_a = jnp.zeros(shape, jnp.int32)
            apack_a = jnp.zeros(shape, jnp.int32)
            dpack_b = jnp.zeros(shape, jnp.int32)
            apack_b = jnp.zeros(shape, jnp.int32)
            for p in range(ppt):
                dpack_a = dpack_a | (ia[2 * p] << (3 * p))
                apack_a = apack_a | (ia[2 * p + 1] << (3 * p))
                dpack_b = dpack_b | (ib[2 * p] << (3 * p))
                apack_b = apack_b | (ib[2 * p + 1] << (3 * p))

            theta = _normal(shape) * jnp.float32(params.kick_noise)
            noise_x = [_uniform_pm1(shape) for _ in range(n)]
            noise_y = [_uniform_pm1(shape) for _ in range(n)]
            (px, py, vx, vy, poss, s0, s1, t, r0, r1, _, _,
             done) = _fused_step(
                px, py, vx, vy, poss, s0, s1, t,
                dirs, acts, theta, noise_x, noise_y, params,
            )
            done_i = done.astype(jnp.int32)
            # stream the six small rows to HBM (scratch layout:
            # [view, field, sub, 128]; f32 fields logp|value|reward,
            # i32 fields dirs|acts|done)
            # the misc DMAs are WAITED one step late (ADVICE r2 #2):
            # wait for step i-1's copies only now, just before
            # overwriting the scratches, so they overlap a full step of
            # compute instead of serializing with the loop
            @pl.when(step_i > 0)
            def _():
                prev_f, prev_i = misc_dmas(step_i - 1)
                prev_f.wait()
                prev_i.wait()

            miscf_scratch[0, 0] = logp_a.reshape(sub, _LANE)
            miscf_scratch[1, 0] = logp_b.reshape(sub, _LANE)
            miscf_scratch[0, 1] = va.reshape(sub, _LANE)
            miscf_scratch[1, 1] = vb.reshape(sub, _LANE)
            miscf_scratch[0, 2] = r0
            miscf_scratch[1, 2] = r1
            misci_scratch[0, 0] = dpack_a
            misci_scratch[1, 0] = dpack_b
            misci_scratch[0, 1] = apack_a
            misci_scratch[1, 1] = apack_b
            misci_scratch[0, 2] = done_i
            misci_scratch[1, 2] = done_i
            dma_f, dma_i = misc_dmas(step_i)
            dma_f.start()
            dma_i.start()
            dma.wait()  # obs scratch reused next iteration
            return (tuple(px), tuple(py), tuple(vx), tuple(vy),
                    poss, s0, s1, t)

        px, py, vx, vy = state[:4]
        init = (tuple(px), tuple(py), tuple(vx), tuple(vy),
                state[4], state[5], state[6], state[7])
        out = jax.lax.fori_loop(0, n_steps, body, init)
        # drain the last step's misc copies (waited one step late)
        last_f, last_i = misc_dmas(n_steps - 1)
        last_f.wait()
        last_i.wait()
        px, py, vx, vy = (list(out[0]), list(out[1]), list(out[2]),
                          list(out[3]))
        _write_state(out_sf, out_si, n, px, py, vx, vy,
                     out[4], out[5], out[6], out[7])
        # bootstrap values of the carried (post-reset) final state
        _, _, last_a = forward(px, py, vx, vy, out[4], False)
        _, _, last_b = forward(px, py, vx, vy, out[4], True)
        lastv_ref[0] = last_a.reshape(sub, _LANE)
        lastv_ref[1] = last_b.reshape(sub, _LANE)

    return kernel


@partial(
    jax.jit,
    static_argnames=("params", "n_steps", "block", "interpret"),
    donate_argnames=("statef", "statei"),
)
def fused_collect(
    statef: jax.Array,
    statei: jax.Array,
    weights: tuple,
    seed: jax.Array,
    params: EnvParams,
    n_steps: int,
    block: int = 1024,
    interpret: bool = False,
):
    """Collect a PPO rollout fully in-kernel (see module docstring).

    weights: flat ActorCritic weights from :func:`flatten_actor_critic`.
    Returns (statef', statei', obs, dirs, acts, logp, value, reward,
    done, last_value) in the shapes listed in the module docstring.
    """
    n = params.n_bodies
    f_dim = 4 * n + 2
    f_pad = -(-f_dim // 8) * 8
    nb = statef.shape[1]
    b = nb * _LANE
    assert b % block == 0, f"n_envs {b} must be a multiple of block {block}"
    # Mosaic tiling constraint (module docstring): a strict sub-block must
    # have a sublane dim (block//128) that is a multiple of 8; the whole
    # per-shard array is exempt (whole-array relaxation).
    assert block % 1024 == 0 or block == b, (
        f"block {block} must be a multiple of 1024 or the whole env count "
        f"{b} (Mosaic sublane tiling)"
    )
    # Actions are bit-packed at 3 bits/player into one int32 word per
    # TEAM — same limit as models.policy.pack_actions for the per-team
    # model (the reference's 1v1..5v5 range is well inside it).
    assert params.players_per_team <= 10, (
        f"fused_collect bit-packs actions at 3 bits/player; "
        f"players_per_team={params.players_per_team} > 10 would corrupt "
        f"the packed words"
    )
    sub = block // _LANE
    n_blocks = b // block
    n_dense = len(weights) // 2

    full = lambda w: pl.BlockSpec(
        w.shape, lambda i, seed: (0,) * w.ndim, memory_space=pltpu.VMEM
    )
    tile3 = lambda rows: pl.BlockSpec(
        (rows, sub, _LANE), lambda i, seed: (0, i, 0),
        memory_space=pltpu.VMEM,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_blocks,),
        in_specs=[
            *[full(w) for w in weights],
            tile3(4 * n),
            tile3(4),
        ],
        out_specs=[
            tile3(4 * n),                              # statef'
            tile3(4),                                  # statei'
            pl.BlockSpec(memory_space=pltpu.ANY),      # obs (HBM, manual DMA)
            pl.BlockSpec(memory_space=pltpu.ANY),      # logp|value|reward
            pl.BlockSpec(memory_space=pltpu.ANY),      # dirs|acts|done
            tile3(2),                                  # last_value (2 views)
        ],
        scratch_shapes=[
            pltpu.VMEM((2, f_pad, sub, _LANE), jnp.float32),
            pltpu.VMEM((2, 3, sub, _LANE), jnp.float32),
            pltpu.VMEM((2, 3, sub, _LANE), jnp.int32),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    out_shape = [
        jax.ShapeDtypeStruct((4 * n, nb, _LANE), jnp.float32),
        jax.ShapeDtypeStruct((4, nb, _LANE), jnp.int32),
        jax.ShapeDtypeStruct((2, f_pad, n_steps, nb, _LANE), jnp.float32),
        jax.ShapeDtypeStruct((n_steps, 2, 3, nb, _LANE), jnp.float32),
        jax.ShapeDtypeStruct((n_steps, 2, 3, nb, _LANE), jnp.int32),
        jax.ShapeDtypeStruct((2, nb, _LANE), jnp.float32),
    ]
    fn = pl.pallas_call(
        _collect_kernel(params, n_steps, sub, n_dense),
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interpret,
    )
    sf2, si2, obs, miscf, misci, last_v = fn(
        jnp.asarray(seed, jnp.int32).reshape(1), *weights, statef, statei
    )
    # unpack the streamed misc rows back into the documented signature
    logp, value, reward = miscf[:, :, 0], miscf[:, :, 1], miscf[:, :, 2]
    dirs, acts, done = misci[:, :, 0], misci[:, :, 1], misci[:, :, 2]
    return sf2, si2, obs, dirs, acts, logp, value, reward, done, last_v
