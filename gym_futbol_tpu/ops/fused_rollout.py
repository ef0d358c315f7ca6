"""Fused T-step rollout as a single Pallas TPU kernel.

The jnp hot path (vector.rollout) is a ``lax.scan`` whose per-step XLA
program reads the env state from HBM, runs ~10^3 fused VPU ops, and
writes it back. The state is tiny (a few hundred KB for 4096 envs), so
the step never saturates HBM — but every step still pays program launch
and HBM round-trip latency T times per rollout.

This kernel removes that: the WHOLE rollout — per-player action sampling
(on-core PRNG), kick/placement noise, possession, kicks, the full
sequential-impulse physics, goals, OOB, rewards, kickoff resets and
auto-reset — runs inside one ``pallas_call``. The env-block state lives
in VMEM registers across all T steps; HBM is touched exactly twice for
state (load block at start, store at end) plus one per-step [block]
reward write.

LAYOUT. A block of ``block`` envs is shaped ``(block//128, 128)`` — an
integer number of 8x128 VPU tiles per per-body scalar. The packed state:

    statef [4*n_bodies, B//128, 128] f32   rows: px | py | vx | vy
    statei [4,          B//128, 128] i32   rows: possession, score0,
                                                 score1, t

The grid is 1-D over env blocks; each grid program owns ``block`` envs.

SEMANTICS. Identical step pipeline to :func:`gym_futbol_tpu.env.step`
with ``auto_reset=True`` — literally the same scalar-form functions from
:mod:`gym_futbol_tpu.game` / :mod:`gym_futbol_tpu.physics` are traced
into the kernel (each "scalar" is an env tile here). The only deviation
is the RNG: the jnp path threads ``jax.random`` (threefry) keys, the
kernel uses the TPU core's native PRNG (`pltpu.prng_random_bits`) — same
distributions, different streams. :func:`fused_rollout_replay` takes
pre-drawn actions and zero noise instead, and is bit-comparable to the
jnp path when ``kick_noise == 0`` and ``placement_noise == 0`` (the test
suite certifies this equivalence).

The reference has no analog of any of this — its hot loop is a Python
``space.step`` call into Chipmunk C (SURVEY.md §3.3); this kernel is the
TPU-native replacement's speed-of-light form.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .. import game
from ..physics import physics_step_scalars
from ..types import EnvParams, EnvState

_LANE = 128


# ---------------------------------------------------------------------------
# Packing: EnvState (batched, leading env axis) <-> tile layout
# ---------------------------------------------------------------------------


def pack_state(state: EnvState, params: EnvParams):
    """Batched EnvState ([B, ...] leaves) -> (statef, statei) tile layout."""
    n = params.n_bodies
    b = state.pos.shape[0]
    assert b % _LANE == 0, f"n_envs must be a multiple of {_LANE}, got {b}"
    rows = [state.pos[:, i, 0] for i in range(n)]
    rows += [state.pos[:, i, 1] for i in range(n)]
    rows += [state.vel[:, i, 0] for i in range(n)]
    rows += [state.vel[:, i, 1] for i in range(n)]
    statef = jnp.stack(rows).reshape(4 * n, b // _LANE, _LANE)
    statei = jnp.stack([
        state.possession,
        state.score[:, 0],
        state.score[:, 1],
        state.t,
    ]).reshape(4, b // _LANE, _LANE)
    return statef, statei


def unpack_state(
    statef: jax.Array, statei: jax.Array, key: jax.Array, params: EnvParams
) -> EnvState:
    """Inverse of :func:`pack_state`. ``key`` re-seeds the jnp-path RNG
    (the kernel's on-core PRNG stream is not representable as a jax key)."""
    n = params.n_bodies
    f = statef.reshape(4 * n, -1)
    i = statei.reshape(4, -1)
    b = f.shape[1]
    pos = jnp.stack(
        [jnp.stack([f[j], f[n + j]], axis=-1) for j in range(n)], axis=1
    )
    vel = jnp.stack(
        [jnp.stack([f[2 * n + j], f[3 * n + j]], axis=-1) for j in range(n)],
        axis=1,
    )
    return EnvState(
        pos=pos,
        vel=vel,
        possession=i[0],
        score=jnp.stack([i[1], i[2]], axis=-1),
        t=i[3],
        key=jax.vmap(jax.random.fold_in, (None, 0))(key, jnp.arange(b)),
    )


# ---------------------------------------------------------------------------
# In-kernel RNG (random-policy mode)
# ---------------------------------------------------------------------------


def _uniform01(shape):
    """Uniform [0, 1) f32 from the core PRNG (24 mantissa-safe bits).

    The bitcast to uint32 is load-bearing: the raw bits lower as SIGNED
    int32, where ``>> 8`` is an arithmetic shift — without it the
    "uniforms" land in [-0.5, 0.5) and silently bias every sample (caught
    by parity/check_fused_actor.py's statistical gate).
    """
    bits = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
    # logical shift in uint32, then bitcast to int32 (top byte now zero,
    # so the value is non-negative); Mosaic lacks a uint32->f32 cast.
    top24 = pltpu.bitcast(bits >> 8, jnp.int32)
    return top24.astype(jnp.float32) * jnp.float32(1.0 / (1 << 24))


# Derivations from a uniform [0, 1) draw — shared by the on-core PRNG
# path and the seed-table path (interpret mode), so both sample the SAME
# distributions from their respective uniform sources.


def _randint5_from(u):
    """Uniform int32 in [0, 5) from a uniform draw."""
    return jnp.floor(u * 5.0).astype(jnp.int32)


def _normal_from(u1, u2):
    """Standard normal via Box-Muller from two uniform draws."""
    u1 = jnp.maximum(u1, jnp.float32(1e-7))
    r = jnp.sqrt(-2.0 * jnp.log(u1))
    return r * jnp.cos(jnp.float32(2.0 * math.pi) * u2)


def _pm1_from(u):
    """Uniform [-1, 1) f32 from a uniform draw."""
    return u * 2.0 - 1.0


def _randint5(shape):
    """Uniform int32 in [0, 5) from the core PRNG."""
    return _randint5_from(_uniform01(shape))


def _normal(shape):
    """Standard normal from the core PRNG (Box-Muller)."""
    return _normal_from(_uniform01(shape), _uniform01(shape))


def _uniform_pm1(shape):
    """Uniform [-1, 1) f32 from the core PRNG."""
    return _pm1_from(_uniform01(shape))


def n_draws_per_step(params: EnvParams) -> int:
    """Uniform draws one fused step consumes: a dir + an act per player,
    two for the Box-Muller kick-noise normal, and an (x, y) placement
    draw per body."""
    return 2 * params.n_players + 2 + 2 * params.n_bodies


# ---------------------------------------------------------------------------
# The fused step (shared by both kernel modes)
# ---------------------------------------------------------------------------


def _fused_step(px, py, vx, vy, possession, score0, score1, t,
                dirs, acts, theta, noise_x, noise_y, params: EnvParams):
    """One env.step(auto_reset=True) on env tiles — the same pipeline as
    gym_futbol_tpu.env.step, built from the same scalar-form functions.
    Returns (new state tiles..., r0/r1 per-team reward tiles, goal flags,
    done)."""
    dtype = jnp.float32
    n = params.n_bodies
    px_before, py_before = list(px), list(py)

    # 2-4: intent
    fx, fy = game.decode_forces_scalars(dirs, acts, params, dtype)
    possession = game.update_possession_scalars(
        px, py, possession, acts, params, dtype
    )
    dvx, dvy, possession = game.apply_kick_scalars(
        px, py, vx, vy, possession, acts, theta, params, dtype
    )
    vx[0] = vx[0] + dvx
    vy[0] = vy[0] + dvy

    # 5-6: dynamics
    px, py, vx, vy = physics_step_scalars(
        px, py, vx, vy, fx, fy, params, dtype
    )
    px[0], py[0], vx[0], vy[0] = game.apply_dribble_scalars(
        px, py, vx, vy, possession, dirs, params, dtype
    )

    # 7-8: goals and bounds
    goal0, goal1 = game.detect_goal_scalars(px[0], py[0], params)
    px, py, vx, vy, ball_clamped = game.clamp_oob_scalars(
        px, py, vx, vy, params, dtype
    )

    # 9: rewards from pre-kickoff positions
    r0, r1 = game.shaped_rewards_scalars(
        px_before, py_before, px, py, possession, goal0, goal1,
        ball_clamped, params, dtype,
    )

    # 10: kickoff re-placement where a goal occurred
    kox, koy = game.kickoff_scalars(noise_x, noise_y, params, dtype)
    any_goal = goal0 | goal1
    zero = jnp.float32(0.0)
    for i in range(n):
        px[i] = jnp.where(any_goal, kox[i], px[i])
        py[i] = jnp.where(any_goal, koy[i], py[i])
        vx[i] = jnp.where(any_goal, zero, vx[i])
        vy[i] = jnp.where(any_goal, zero, vy[i])
    neg1 = jnp.int32(-1)
    possession = jnp.where(any_goal, neg1, possession)
    score0 = score0 + goal0.astype(jnp.int32)
    score1 = score1 + goal1.astype(jnp.int32)

    # 11: clock + fused auto-reset (reuses this step's kickoff draw,
    # exactly like env.step(auto_reset=True))
    t = t + 1
    done = t >= params.max_steps
    for i in range(n):
        px[i] = jnp.where(done, kox[i], px[i])
        py[i] = jnp.where(done, koy[i], py[i])
        vx[i] = jnp.where(done, zero, vx[i])
        vy[i] = jnp.where(done, zero, vy[i])
    possession = jnp.where(done, neg1, possession)
    score0 = jnp.where(done, 0, score0)
    score1 = jnp.where(done, 0, score1)
    t = jnp.where(done, 0, t)

    return (px, py, vx, vy, possession, score0, score1, t, r0, r1, goal0,
            goal1, done)


def _read_state(sf_ref, si_ref, n):
    px = [sf_ref[i] for i in range(n)]
    py = [sf_ref[n + i] for i in range(n)]
    vx = [sf_ref[2 * n + i] for i in range(n)]
    vy = [sf_ref[3 * n + i] for i in range(n)]
    return px, py, vx, vy, si_ref[0], si_ref[1], si_ref[2], si_ref[3]


def _write_state(out_sf, out_si, n, px, py, vx, vy, poss, s0, s1, t):
    for i in range(n):
        out_sf[i] = px[i]
        out_sf[n + i] = py[i]
        out_sf[2 * n + i] = vx[i]
        out_sf[3 * n + i] = vy[i]
    out_si[0] = poss
    out_si[1] = s0
    out_si[2] = s1
    out_si[3] = t


# ---------------------------------------------------------------------------
# Random-policy kernel (the bench hot path)
# ---------------------------------------------------------------------------


def _random_rollout_kernel(params: EnvParams, n_steps: int, sub: int,
                           seed_table: bool = False):
    """Random-policy kernel body. ``seed_table=False`` (production) draws
    from the TPU core PRNG; ``seed_table=True`` reads pre-drawn uniforms
    from an extra [n_steps, n_draws, sub, 128] input — the
    interpret-mode path (the CPU interpreter lacks
    ``pltpu.prng_random_bits``), sampling the SAME distributions through
    the same ``*_from`` derivations so the production kernel structure
    (including the seed-driven stream decorrelation) is exercised on fake
    multi-device meshes (VERDICT r3 item 5)."""
    n = params.n_bodies
    n_players = params.n_players
    shape = (sub, _LANE)

    def kernel(*refs):
        if seed_table:
            sf_ref, si_ref, u_ref, out_sf, out_si, rew_ref = refs
        else:
            seed_ref, sf_ref, si_ref, out_sf, out_si, rew_ref = refs
            # Independent per-block stream; a large odd prime spreads
            # block ids.
            pltpu.prng_seed(seed_ref[0] + pl.program_id(0) * 0x27D4EB2F)
        state = _read_state(sf_ref, si_ref, n)

        def body(step_i, carry):
            px, py, vx, vy, poss, s0, s1, t = (
                list(carry[0]), list(carry[1]), list(carry[2]),
                list(carry[3]), carry[4], carry[5], carry[6], carry[7],
            )
            if seed_table:
                counter = iter(range(n_draws_per_step(params)))
                nxt = lambda: u_ref[step_i, next(counter)]
            else:
                nxt = lambda: _uniform01(shape)
            dirs = [_randint5_from(nxt()) for _ in range(n_players)]
            acts = [_randint5_from(nxt()) for _ in range(n_players)]
            theta = _normal_from(nxt(), nxt()) * jnp.float32(
                params.kick_noise
            )
            noise_x = [_pm1_from(nxt()) for _ in range(n)]
            noise_y = [_pm1_from(nxt()) for _ in range(n)]
            (px, py, vx, vy, poss, s0, s1, t, r0, _, _, _,
             _) = _fused_step(
                px, py, vx, vy, poss, s0, s1, t,
                dirs, acts, theta, noise_x, noise_y, params,
            )
            rew_ref[step_i] = r0
            return (tuple(px), tuple(py), tuple(vx), tuple(vy),
                    poss, s0, s1, t)

        px, py, vx, vy = state[:4]
        init = (tuple(px), tuple(py), tuple(vx), tuple(vy),
                state[4], state[5], state[6], state[7])
        out = jax.lax.fori_loop(0, n_steps, body, init)
        _write_state(out_sf, out_si, n,
                     list(out[0]), list(out[1]), list(out[2]), list(out[3]),
                     out[4], out[5], out[6], out[7])

    return kernel


@partial(
    jax.jit,
    static_argnames=("params", "n_steps", "block", "interpret"),
    donate_argnames=("statef", "statei"),
)
def fused_rollout(
    statef: jax.Array,
    statei: jax.Array,
    seed: jax.Array,
    params: EnvParams,
    n_steps: int,
    block: int = 2048,
    interpret: bool = False,
):
    """Run ``n_steps`` of random-policy auto-reset rollout fully in-kernel.

    statef/statei: packed state from :func:`pack_state`. seed: int32 [1].
    Returns (statef', statei', rewards [n_steps, B//128, 128]) where
    rewards are the per-step team-0 shaped rewards (same quantity as
    ``StepOutput.reward``; reshape to [n_steps, B] via ``.reshape(T, -1)``).

    ``interpret=True`` (CPU tests / the driver's fake-device dryrun) runs
    the same kernel with the on-core PRNG replaced by a seed-derived
    uniform table (the interpreter lacks ``pltpu.prng_random_bits``); the
    seed still fully determines the stream, so per-shard seed
    decorrelation (parallel.shard_fused_rollout) is exercised for real.
    """
    n = params.n_bodies
    nb = statef.shape[1]            # B // 128
    b = nb * _LANE
    assert b % block == 0, f"n_envs {b} must be a multiple of block {block}"
    sub = block // _LANE            # sublanes per block
    n_blocks = b // block

    if interpret:
        n_draws = n_draws_per_step(params)
        u = jax.random.uniform(
            jax.random.PRNGKey(jnp.asarray(seed, jnp.int32).reshape(1)[0]),
            (n_steps, n_draws, nb, _LANE), jnp.float32,
        )
        grid_spec = pl.GridSpec(
            grid=(n_blocks,),
            in_specs=[
                pl.BlockSpec((4 * n, sub, _LANE), lambda i: (0, i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((4, sub, _LANE), lambda i: (0, i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((n_steps, n_draws, sub, _LANE),
                             lambda i: (0, 0, i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((4 * n, sub, _LANE), lambda i: (0, i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((4, sub, _LANE), lambda i: (0, i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((n_steps, sub, _LANE), lambda i: (0, i, 0),
                             memory_space=pltpu.VMEM),
            ],
        )
        out_shape = [
            jax.ShapeDtypeStruct((4 * n, nb, _LANE), jnp.float32),
            jax.ShapeDtypeStruct((4, nb, _LANE), jnp.int32),
            jax.ShapeDtypeStruct((n_steps, nb, _LANE), jnp.float32),
        ]
        fn = pl.pallas_call(
            _random_rollout_kernel(params, n_steps, sub, seed_table=True),
            grid_spec=grid_spec,
            out_shape=out_shape,
            interpret=True,
        )
        return tuple(fn(statef, statei, u))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_blocks,),
        in_specs=[
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
        ],
    )
    out_shape = [
        jax.ShapeDtypeStruct((4 * n, nb, _LANE), jnp.float32),
        jax.ShapeDtypeStruct((4, nb, _LANE), jnp.int32),
        jax.ShapeDtypeStruct((n_steps, nb, _LANE), jnp.float32),
    ]
    fn = pl.pallas_call(
        _random_rollout_kernel(params, n_steps, sub),
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interpret,
    )
    return tuple(fn(jnp.asarray(seed, jnp.int32).reshape(1), statef, statei))


# ---------------------------------------------------------------------------
# Replay kernel (deterministic; equivalence testing vs the jnp path)
# ---------------------------------------------------------------------------


def _replay_rollout_kernel(params: EnvParams, n_steps: int, sub: int):
    n = params.n_bodies
    n_players = params.n_players
    shape = (sub, _LANE)

    def kernel(sf_ref, si_ref, act_ref, out_sf, out_si, rew_ref):
        state = _read_state(sf_ref, si_ref, n)
        zf = jnp.zeros(shape, jnp.float32)

        def body(step_i, carry):
            px, py, vx, vy, poss, s0, s1, t = (
                list(carry[0]), list(carry[1]), list(carry[2]),
                list(carry[3]), carry[4], carry[5], carry[6], carry[7],
            )
            dirs = [act_ref[step_i, 2 * p] for p in range(n_players)]
            acts = [act_ref[step_i, 2 * p + 1] for p in range(n_players)]
            (px, py, vx, vy, poss, s0, s1, t, r0, _, _, _,
             _) = _fused_step(
                px, py, vx, vy, poss, s0, s1, t,
                dirs, acts, zf, [zf] * n, [zf] * n, params,
            )
            rew_ref[step_i] = r0
            return (tuple(px), tuple(py), tuple(vx), tuple(vy),
                    poss, s0, s1, t)

        px, py, vx, vy = state[:4]
        init = (tuple(px), tuple(py), tuple(vx), tuple(vy),
                state[4], state[5], state[6], state[7])
        out = jax.lax.fori_loop(0, n_steps, body, init)
        _write_state(out_sf, out_si, n,
                     list(out[0]), list(out[1]), list(out[2]), list(out[3]),
                     out[4], out[5], out[6], out[7])

    return kernel


@partial(
    jax.jit,
    static_argnames=("params", "block", "interpret"),
)
def fused_rollout_replay(
    statef: jax.Array,
    statei: jax.Array,
    actions: jax.Array,
    params: EnvParams,
    block: int = 2048,
    interpret: bool = False,
):
    """Deterministic fused rollout replaying pre-drawn actions.

    actions: [T, 2*n_players, B//128, 128] int32 — per step, interleaved
    (dir, act) per player. Kick/placement noise is forced to zero, so the
    result matches the jnp path exactly when ``params.kick_noise == 0``
    and ``params.placement_noise == 0`` (certified by tests/test_ops.py).
    """
    n = params.n_bodies
    n_steps = actions.shape[0]
    nb = statef.shape[1]
    b = nb * _LANE
    assert b % block == 0, f"n_envs {b} must be a multiple of block {block}"
    sub = block // _LANE
    n_blocks = b // block

    grid_spec = pl.GridSpec(
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((4 * n, sub, _LANE), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4, sub, _LANE), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_steps, 2 * params.n_players, sub, _LANE),
                         lambda i: (0, 0, i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((4 * n, sub, _LANE), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4, sub, _LANE), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_steps, sub, _LANE), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
        ],
    )
    out_shape = [
        jax.ShapeDtypeStruct((4 * n, nb, _LANE), jnp.float32),
        jax.ShapeDtypeStruct((4, nb, _LANE), jnp.int32),
        jax.ShapeDtypeStruct((n_steps, nb, _LANE), jnp.float32),
    ]
    fn = pl.pallas_call(
        _replay_rollout_kernel(params, n_steps, sub),
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interpret,
    )
    return tuple(fn(statef, statei, actions))
