"""Policy-in-kernel self-play rollout: MLP actors on the MXU inside the
fused env kernel.

:mod:`fused_rollout` fuses the env; this kernel also fuses the ACTOR.
Each step, inside one Mosaic program: build both teams' observation
matrices from the resident state tiles, run a per-team MLP policy
(matmuls on the MXU via ``dot_general``), sample actions in row form
with the on-core PRNG, then run the full env step — physics, possession,
kicks, goals, rewards, auto-reset — without ever leaving VMEM.

This is the evaluation/self-play hot path (``evaluate.py`` semantics:
team 1's policy sees the mirrored observation and its direction actions
are un-mirrored — see ``mirror_obs``/``joint_policy`` there). Each team's
policy is a per-team MLP: obs -> hidden... -> ppt*2*5 logits, weights
passed as plain arrays (same for both sides = true self-play).

Matrix layout: the policy math runs on [feature, block] matrices — envs
on the minor (lane) axis, features on sublanes — so every Dense layer is
one MXU contraction and every categorical distribution is a row, never a
padded minor dim (see models/policy.py for why that matters).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..types import EnvParams
from .fused_rollout import _LANE, _fused_step, _read_state, _uniform01, _write_state

N_CHOICES = 5


def mlp_weight_shapes(params: EnvParams, hidden=(128, 128)):
    """[(W, b), ...] shapes for the per-team policy MLP."""
    f = 4 * params.n_bodies + 2
    dims = [f, *hidden, params.players_per_team * 2 * N_CHOICES]
    return [((dims[i], dims[i + 1]), (dims[i + 1], 1))
            for i in range(len(dims) - 1)]


def init_mlp(key: jax.Array, params: EnvParams, hidden=(128, 128)):
    """He-initialized per-team policy weights: flat tuple (W1, b1, W2, ...)."""
    out = []
    for (ws, bs) in mlp_weight_shapes(params, hidden):
        key, k = jax.random.split(key)
        out.append(jax.random.normal(k, ws, jnp.float32) / jnp.sqrt(ws[0]))
        out.append(jnp.zeros(bs, jnp.float32))
    return tuple(out)


def mlp_team_policy(weights: tuple, params: EnvParams):
    """jnp reference of the in-kernel per-team policy, as an
    evaluate.TeamPolicy — the same MLP math and the same inverse-CDF
    sampling distribution (models.policy.sample_actions), so kernel-vs-jnp
    evaluation statistics are directly comparable
    (parity/check_fused_actor.py)."""
    from ..models.policy import sample_actions

    n_layers = len(weights) // 2

    def policy(key: jax.Array, obs: jax.Array) -> jax.Array:
        x = obs
        for li in range(n_layers):
            w, b = weights[2 * li], weights[2 * li + 1]
            x = x @ w + b[:, 0]
            if li < n_layers - 1:
                x = jnp.tanh(x)
        actions, _ = sample_actions(key, x)
        return actions

    return policy


def _obs_matrix(px, py, vx, vy, possession, params: EnvParams, mirror: bool,
                block: int):
    """env.observe as a [F, block] matrix built from state tiles.

    mirror=True produces the team-1 view (evaluate.mirror_obs): x -> 1-x,
    vx -> -vx, team blocks swapped, possession flags swapped.
    """
    n = params.n_bodies
    ppt = params.players_per_team
    inv_w = jnp.float32(1.0 / params.width)
    inv_h = jnp.float32(1.0 / params.height)
    inv_s = jnp.float32(1.0 / params.max_speed)
    one = jnp.float32(1.0)

    if mirror:
        order = [0] + list(range(1 + ppt, 1 + 2 * ppt)) + list(range(1, 1 + ppt))
    else:
        order = list(range(n))

    rows = []
    for i in order:
        x = px[i] * inv_w
        rows.append((one - x) if mirror else x)
        rows.append(py[i] * inv_h)
    for i in order:
        v = vx[i] * inv_s
        rows.append(-v if mirror else v)
        rows.append(vy[i] * inv_s)
    owner_p = possession - 1
    owns0 = ((possession > 0) & (owner_p < ppt)).astype(jnp.float32)
    owns1 = ((possession > 0) & (owner_p >= ppt)).astype(jnp.float32)
    rows += [owns1, owns0] if mirror else [owns0, owns1]
    return jnp.stack([r.reshape(block) for r in rows])


def _mlp_logit_rows(x, weights, block: int):
    """x: [F, block]. Dense stack with tanh; returns logits [G*5, block].

    Each layer is dot_general(W^T-style contraction over the feature dim)
    -> one MXU matmul per layer with envs on the lane axis.
    """
    n_layers = len(weights) // 2
    for li in range(n_layers):
        w, b = weights[2 * li], weights[2 * li + 1]
        x = jax.lax.dot_general(
            w, x, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + b  # [out, block] + [out, 1]
        if li < n_layers - 1:
            x = jnp.tanh(x)
    return x


def _sample_rows(logit_rows, n_groups: int, block: int, sub: int):
    """Inverse-CDF sampling per 5-way group (row form, on-core PRNG).
    Returns per-group action index tiles [(sub, 128)] * n_groups."""
    out = []
    for g in range(n_groups):
        rows = [logit_rows[g * N_CHOICES + i] for i in range(N_CHOICES)]
        m = rows[0]
        for r in rows[1:]:
            m = jnp.maximum(m, r)
        exps = [jnp.exp(r - m) for r in rows]
        z = exps[0]
        for e in exps[1:]:
            z = z + e
        u = _uniform01((sub, _LANE)).reshape(block) * z
        cum = exps[0]
        idx = (u > cum).astype(jnp.int32)
        for i in range(1, N_CHOICES - 1):
            cum = cum + exps[i]
            idx = idx + (u > cum).astype(jnp.int32)
        out.append(idx.reshape(sub, _LANE))
    return out


def _unmirror_dir(d):
    """Swap left/right (2 <-> 4) for the mirrored team's direction."""
    return jnp.where(d == 2, jnp.int32(4), jnp.where(d == 4, jnp.int32(2), d))


def _selfplay_kernel(params: EnvParams, n_steps: int, sub: int,
                     n_layers: int):
    n = params.n_bodies
    ppt = params.players_per_team
    block = sub * _LANE
    shape = (sub, _LANE)

    def kernel(seed_ref, *refs):
        wa = [refs[i] for i in range(2 * n_layers)]
        wb = [refs[2 * n_layers + i] for i in range(2 * n_layers)]
        sf_ref, si_ref = refs[4 * n_layers], refs[4 * n_layers + 1]
        out_sf, out_si = refs[4 * n_layers + 2], refs[4 * n_layers + 3]
        rew_ref, goals_ref = refs[4 * n_layers + 4], refs[4 * n_layers + 5]

        pltpu.prng_seed(seed_ref[0] + pl.program_id(0) * 0x27D4EB2F)
        wa = [w[:] for w in wa]  # load weights into registers once
        wb = [w[:] for w in wb]
        state = _read_state(sf_ref, si_ref, n)

        def body(step_i, carry):
            px, py, vx, vy, poss, s0, s1, t, g0_acc, g1_acc = (
                list(carry[0]), list(carry[1]), list(carry[2]),
                list(carry[3]), carry[4], carry[5], carry[6], carry[7],
                carry[8], carry[9],
            )
            # --- policy A (team 0 view) and B (mirrored team 1 view) ----
            xa = _obs_matrix(px, py, vx, vy, poss, params, False, block)
            la = _mlp_logit_rows(xa, wa, block)
            ia = _sample_rows(la, 2 * ppt, block, sub)
            xb = _obs_matrix(px, py, vx, vy, poss, params, True, block)
            lb = _mlp_logit_rows(xb, wb, block)
            ib = _sample_rows(lb, 2 * ppt, block, sub)

            dirs = [ia[2 * p] for p in range(ppt)]
            acts = [ia[2 * p + 1] for p in range(ppt)]
            dirs += [_unmirror_dir(ib[2 * p]) for p in range(ppt)]
            acts += [ib[2 * p + 1] for p in range(ppt)]

            # --- kick noise + kickoff noise from the core PRNG ----------
            u1 = jnp.maximum(_uniform01(shape), jnp.float32(1e-7))
            u2 = _uniform01(shape)
            theta = jnp.sqrt(-2.0 * jnp.log(u1)) * jnp.cos(
                jnp.float32(2.0 * 3.14159265358979) * u2
            ) * jnp.float32(params.kick_noise)
            noise_x = [_uniform01(shape) * 2.0 - 1.0 for _ in range(n)]
            noise_y = [_uniform01(shape) * 2.0 - 1.0 for _ in range(n)]

            (px, py, vx, vy, poss, s0, s1, t, r0, _, goal0, goal1,
             _) = _fused_step(
                px, py, vx, vy, poss, s0, s1, t,
                dirs, acts, theta, noise_x, noise_y, params,
            )
            rew_ref[step_i] = r0
            g0_acc = g0_acc + goal0.astype(jnp.int32)
            g1_acc = g1_acc + goal1.astype(jnp.int32)
            return (tuple(px), tuple(py), tuple(vx), tuple(vy),
                    poss, s0, s1, t, g0_acc, g1_acc)

        px, py, vx, vy = state[:4]
        zi = jnp.zeros(shape, jnp.int32)
        init = (tuple(px), tuple(py), tuple(vx), tuple(vy),
                state[4], state[5], state[6], state[7], zi, zi)
        out = jax.lax.fori_loop(0, n_steps, body, init)
        _write_state(out_sf, out_si, n,
                     list(out[0]), list(out[1]), list(out[2]), list(out[3]),
                     out[4], out[5], out[6], out[7])
        goals_ref[0] = out[8]
        goals_ref[1] = out[9]

    return kernel


@partial(
    jax.jit,
    static_argnames=("params", "n_steps", "block", "interpret"),
    donate_argnames=("statef", "statei"),
)
def fused_selfplay_rollout(
    statef: jax.Array,
    statei: jax.Array,
    weights_a: tuple,
    weights_b: tuple,
    seed: jax.Array,
    params: EnvParams,
    n_steps: int,
    block: int = 1024,
    interpret: bool = False,
):
    """Policy-vs-policy rollout fully in-kernel (see module docstring).

    weights_a/b: flat (W1, b1, ..., Wl, bl) per-team MLPs from
    :func:`init_mlp` (pass the same tuple twice for self-play).
    Returns (statef', statei', rewards [n_steps, B//128, 128],
    goals [2, B//128, 128]) — rewards are team-0 shaped rewards, goals
    are per-env totals over the whole rollout (not reset per episode).
    """
    n = params.n_bodies
    nb = statef.shape[1]
    b = nb * _LANE
    assert b % block == 0, f"n_envs {b} must be a multiple of block {block}"
    sub = block // _LANE
    n_blocks = b // block
    assert len(weights_a) == len(weights_b)
    n_layers = len(weights_a) // 2

    full = lambda w: pl.BlockSpec(
        w.shape, lambda i, seed: (0,) * w.ndim, memory_space=pltpu.VMEM
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_blocks,),
        in_specs=[
            *[full(w) for w in weights_a],
            *[full(w) for w in weights_b],
            pl.BlockSpec((4 * n, sub, _LANE), lambda i, seed: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4, sub, _LANE), lambda i, seed: (0, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((4 * n, sub, _LANE), lambda i, seed: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4, sub, _LANE), lambda i, seed: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_steps, sub, _LANE), lambda i, seed: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, sub, _LANE), lambda i, seed: (0, i, 0),
                         memory_space=pltpu.VMEM),
        ],
    )
    out_shape = [
        jax.ShapeDtypeStruct((4 * n, nb, _LANE), jnp.float32),
        jax.ShapeDtypeStruct((4, nb, _LANE), jnp.int32),
        jax.ShapeDtypeStruct((n_steps, nb, _LANE), jnp.float32),
        jax.ShapeDtypeStruct((2, nb, _LANE), jnp.int32),
    ]
    fn = pl.pallas_call(
        _selfplay_kernel(params, n_steps, sub, n_layers),
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interpret,
    )
    return tuple(fn(
        jnp.asarray(seed, jnp.int32).reshape(1),
        *weights_a, *weights_b, statef, statei,
    ))
