"""Batched, branch-free 2-D rigid-body physics for FutbolEnv on TPU.

This module replaces the reference's entire native hot loop — pymunk's
vendored Chipmunk2D C library driven once per ``env.step`` (SURVEY.md §2.2,
§3.3) — with pure-functional JAX written for XLA/TPU: static shapes, fixed
trip counts, masked selects instead of branches, vectorized over the env
batch with ``vmap``. The reference mount was empty at build time (SURVEY.md
§0), so no ``file:line`` citations exist; the integration semantics below
follow Chipmunk2D's *documented public* update rule and the contact solver
is a precisely-specified sequential-impulse scheme that our C++ oracle
(``native/oracle.cpp``) implements bit-identically for parity testing.

PHYSICS SPEC (normative — the C++ oracle and any Pallas kernel must match):

Let ``dt_sub = params.dt / params.substeps``. One ``physics_step`` runs
``substeps`` sub-steps; each sub-step is:

1. **Velocity integration** (Chipmunk rule, zero gravity top-down field)::

       v <- v * damping**dt_sub + (f / m) * dt_sub
       v <- v * min(1, max_speed / |v|)          # stability clamp

   Forces are constant across the sub-steps of one env.step (the reference
   applies per-step forces once; Chipmunk holds them until cleared).

2. **Contact generation** (all-pairs; N <= 11 bodies so the O(N^2) masked
   form beats any broad-phase on TPU — SURVEY.md §2.2):

   - circle–circle for every unordered pair (i, j), i < j, in fixed
     lexicographic order. Normal ``n`` points i -> j. Penetration
     ``d = (r_i + r_j) - |p_j - p_i|``; the contact is *active* iff d > 0.
   - circle–wall for each body against the 4 field walls, in wall order
     [bottom, top, left, right]. Side walls have a goal-mouth gap: the
     *ball* passes freely when its center's y is inside
     [goal_y_lo, goal_y_hi]; players are always blocked (they stay on the
     field; the ball may enter the goal mouth to score).

3. **Impulse solve** — ``solver_iterations`` iterations of sequential
   impulses with accumulated-impulse clamping (Box2D-lite style; Chipmunk
   splits bias into pseudo-velocities, we fold it into the velocity target —
   a deliberate, documented deviation, mirrored exactly by the oracle).
   Per contact, precomputed once per sub-step:

       e        = e_a * e_b                      # restitution, product rule
       bounce   = e * min(vrn0, 0)               # vrn0 = pre-solve (v_b-v_a)·n
       v_bias   = (baumgarte / dt_sub) * max(0, d - collision_slop)
       k_n      = 1 / (inv_m_a + inv_m_b)        # moment = inf (no rotation)

   Each iteration, contacts processed in the fixed order
   (all circle–circle pairs sequentially, then walls)::

       vrn   = (v_b - v_a) · n
       dj    = -k_n * (vrn + bounce + (-v_bias))     # drive vrn -> -bounce + v_bias
       jn'   = max(jn_acc + dj, 0); dj = jn' - jn_acc; jn_acc = jn'
       v_a  -= dj * n * inv_m_a ;  v_b += dj * n * inv_m_b
       # friction (tangent t = perp(n), k_t = k_n):
       vrt   = (v_b - v_a) · t
       djt   = -k_n * vrt
       jt'   = clamp(jt_acc + djt, -mu*jn_acc, mu*jn_acc)
       djt   = jt' - jt_acc; jt_acc = jt'
       v_a  -= djt * t * inv_m_a ;  v_b += djt * t * inv_m_b

   Inactive contacts contribute exactly zero (masked multiplies — no
   branches, so the compiled program is identical for every env in the
   batch). Wall contacts of one wall touch disjoint bodies against a
   static wall, so they are mathematically order-independent and are
   applied as one vectorized update per wall.

4. **Position integration**: ``x <- x + v * dt_sub``.

Everything is dtype-polymorphic: float32 on TPU for throughput, float64
under ``jax_enable_x64`` on CPU for oracle parity (SURVEY.md §4.2.1).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .types import EnvParams, body_elasticities, body_masses, body_radii

# ---------------------------------------------------------------------------
# Static pair table
# ---------------------------------------------------------------------------


def circle_pairs(n_bodies: int) -> list[tuple[int, int]]:
    """Fixed lexicographic pair order — the normative sequential order."""
    return [(i, j) for i in range(n_bodies) for j in range(i + 1, n_bodies)]


# ---------------------------------------------------------------------------
# Sub-step pieces (single env; vmap for batch)
# ---------------------------------------------------------------------------


def integrate_velocity(
    vel: jax.Array, forces: jax.Array, inv_mass: jax.Array,
    params: EnvParams, dt_sub: float,
) -> jax.Array:
    """Spec item 1. vel/forces [N,2], inv_mass [N]."""
    dtype = vel.dtype
    damp = jnp.asarray(params.damping, dtype) ** jnp.asarray(dt_sub, dtype)
    v = vel * damp + forces * inv_mass[:, None] * jnp.asarray(dt_sub, dtype)
    speed = jnp.sqrt(jnp.sum(v * v, axis=-1, keepdims=True))
    scale = jnp.minimum(
        jnp.asarray(1.0, dtype),
        jnp.asarray(params.max_speed, dtype) / jnp.maximum(speed, 1e-12),
    )
    return v * scale


def _wall_geometry(pos: jax.Array, radii: jax.Array, params: EnvParams):
    """Penetration depth + normals against the 4 walls (spec item 2).

    Returns (d [4,N], n [4,2]) with d > 0 meaning penetration. Side walls
    are open over the goal mouth for the ball only.
    """
    dtype = pos.dtype
    x, y = pos[:, 0], pos[:, 1]
    r = radii
    n_bodies = pos.shape[0]

    # is this body the ball, and is it level with the goal mouth?
    is_ball = jnp.arange(n_bodies) == 0
    in_mouth = (y >= params.goal_y_lo) & (y <= params.goal_y_hi)
    passes = is_ball & in_mouth  # [N] True -> side walls inactive

    d_bottom = r - y
    d_top = r - (jnp.asarray(params.height, dtype) - y)
    d_left = jnp.where(passes, jnp.asarray(-1.0, dtype), r - x)
    d_right = jnp.where(
        passes, jnp.asarray(-1.0, dtype), r - (jnp.asarray(params.width, dtype) - x)
    )

    d = jnp.stack([d_bottom, d_top, d_left, d_right])  # [4, N]
    n = jnp.asarray(
        [[0.0, 1.0], [0.0, -1.0], [1.0, 0.0], [-1.0, 0.0]], dtype=dtype
    )  # [4, 2] wall normals pointing into the field
    return d, n


def solve_contacts(
    pos: jax.Array, vel: jax.Array, params: EnvParams,
    inv_mass: jax.Array, radii: jax.Array, elas: jax.Array,
) -> jax.Array:
    """Spec items 2–3: returns post-solve velocities. Shapes as in module doc."""
    dtype = vel.dtype
    pairs = circle_pairs(pos.shape[0])
    n_pairs = len(pairs)
    ii = jnp.asarray([p[0] for p in pairs])
    jj = jnp.asarray([p[1] for p in pairs])

    eps = jnp.asarray(1e-12, dtype)
    one = jnp.asarray(1.0, dtype)
    zero = jnp.asarray(0.0, dtype)
    mu = jnp.asarray(params.friction, dtype)
    slop = jnp.asarray(params.collision_slop, dtype)
    dt_sub = params.dt / params.substeps
    bias_coef = jnp.asarray(params.baumgarte / dt_sub, dtype)

    # ---- circle–circle precompute -------------------------------------
    dp = pos[jj] - pos[ii]                                   # [P,2]
    dist = jnp.sqrt(jnp.sum(dp * dp, axis=-1))               # [P]
    pen = (radii[ii] + radii[jj]) - dist                     # [P] >0 = hit
    active = (pen > 0).astype(dtype)                         # [P]
    n_cc = dp / jnp.maximum(dist, eps)[:, None]              # [P,2] i->j
    t_cc = jnp.stack([-n_cc[:, 1], n_cc[:, 0]], axis=-1)     # perp
    kn_cc = one / (inv_mass[ii] + inv_mass[jj])              # [P]
    e_cc = elas[ii] * elas[jj]
    vrn0_cc = jnp.sum((vel[jj] - vel[ii]) * n_cc, axis=-1)
    bounce_cc = e_cc * jnp.minimum(vrn0_cc, zero)
    vbias_cc = bias_coef * jnp.maximum(pen - slop, zero)

    # ---- wall precompute ----------------------------------------------
    d_w, n_w = _wall_geometry(pos, radii, params)            # [4,N], [4,2]
    active_w = (d_w > 0).astype(dtype)                       # [4,N]
    t_w = jnp.stack([-n_w[:, 1], n_w[:, 0]], axis=-1)        # [4,2]
    kn_w = one / inv_mass                                    # [N] wall inv_m = 0
    e_w = elas * jnp.asarray(params.wall_elasticity, dtype)  # [N]
    vrn0_w = vel @ n_w.T                                     # [N,4] body vel · n
    bounce_w = e_w[:, None] * jnp.minimum(vrn0_w, zero)      # [N,4]
    vbias_w = bias_coef * jnp.maximum(d_w.T - slop, zero)    # [N,4]

    # Everything below is SSA-style: velocities live as a tuple of per-body
    # rows and impulse accumulators as scalar tuples, so the unrolled
    # sequential loop lowers to pure dataflow (no scatters — scatters made
    # XLA compile times explode and serialize badly on TPU).
    n_bodies = pos.shape[0]
    inv_m = [inv_mass[i] for i in range(n_bodies)]
    kn_p = [kn_cc[p] for p in range(n_pairs)]
    act_p = [active[p] for p in range(n_pairs)]
    n_p = [n_cc[p] for p in range(n_pairs)]
    t_p = [t_cc[p] for p in range(n_pairs)]
    bounce_p = [bounce_cc[p] for p in range(n_pairs)]
    vbias_p = [vbias_cc[p] for p in range(n_pairs)]

    def one_iteration(_, carry):
        v_rows, jn_cc, jt_cc, jn_w, jt_w = carry
        v = list(v_rows)
        jn_cc = list(jn_cc)
        jt_cc = list(jt_cc)
        jn_w = list(jn_w)
        jt_w = list(jt_w)

        # -- circle–circle, sequential in fixed order (unrolled) --------
        for p, (i, j) in enumerate(pairs):
            m = act_p[p]
            n = n_p[p]
            tt = t_p[p]
            vrn = (v[j] - v[i]) @ n
            dj = -kn_p[p] * (vrn + bounce_p[p] - vbias_p[p])
            jn_new = jnp.maximum(jn_cc[p] + dj, zero)
            dj = (jn_new - jn_cc[p]) * m
            jn_cc[p] = jn_cc[p] + dj
            dv = dj * n
            v[i] = v[i] - dv * inv_m[i]
            v[j] = v[j] + dv * inv_m[j]
            # friction
            vrt = (v[j] - v[i]) @ tt
            djt = -kn_p[p] * vrt
            lim = mu * jn_cc[p]
            jt_new = jnp.clip(jt_cc[p] + djt, -lim, lim)
            djt = (jt_new - jt_cc[p]) * m
            jt_cc[p] = jt_cc[p] + djt
            dv = djt * tt
            v[i] = v[i] - dv * inv_m[i]
            v[j] = v[j] + dv * inv_m[j]

        # -- walls: 4 vectorized passes (order-independent per wall) ----
        vel_s = jnp.stack(v)                                 # [N,2]
        for w in range(4):
            m = active_w[w]                                  # [N]
            n = n_w[w]                                       # [2]
            tt = t_w[w]
            vrn = vel_s @ n                                  # [N]
            dj = -kn_w * (vrn + bounce_w[:, w] - vbias_w[:, w])
            jn_new = jnp.maximum(jn_w[w] + dj, zero)
            dj = (jn_new - jn_w[w]) * m
            jn_w[w] = jn_w[w] + dj
            vel_s = vel_s + (dj * inv_mass)[:, None] * n
            vrt = vel_s @ tt
            djt = -kn_w * vrt
            lim = mu * jn_w[w]
            jt_new = jnp.clip(jt_w[w] + djt, -lim, lim)
            djt = (jt_new - jt_w[w]) * m
            jt_w[w] = jt_w[w] + djt
            vel_s = vel_s + (djt * inv_mass)[:, None] * tt
        v = [vel_s[i] for i in range(n_bodies)]

        return tuple(v), tuple(jn_cc), tuple(jt_cc), tuple(jn_w), tuple(jt_w)

    init = (
        tuple(vel[i] for i in range(n_bodies)),
        tuple(zero for _ in range(n_pairs)),
        tuple(zero for _ in range(n_pairs)),
        tuple(jnp.zeros((n_bodies,), dtype) for _ in range(4)),
        tuple(jnp.zeros((n_bodies,), dtype) for _ in range(4)),
    )
    v_rows, *_ = jax.lax.fori_loop(0, params.solver_iterations, one_iteration, init)
    return jnp.stack(v_rows)


def _substep(carry, _, params: EnvParams, inv_mass, radii, elas, dt_sub):
    pos, vel, forces = carry
    vel = integrate_velocity(vel, forces, inv_mass, params, dt_sub)
    vel = solve_contacts(pos, vel, params, inv_mass, radii, elas)
    pos = pos + vel * jnp.asarray(dt_sub, pos.dtype)
    return (pos, vel, forces), None


@partial(jax.jit, static_argnames=("params",))
def physics_step(
    pos: jax.Array, vel: jax.Array, forces: jax.Array, params: EnvParams
) -> tuple[jax.Array, jax.Array]:
    """Advance one full env.step of simulated time (= ``params.dt``).

    pos/vel/forces: [n_bodies, 2]. Forces are held constant across the
    ``params.substeps`` sub-steps and implicitly cleared by the caller
    passing fresh forces next step (Chipmunk clears forces post-step).
    """
    dtype = pos.dtype
    inv_mass = (1.0 / body_masses(params, dtype)).astype(dtype)
    radii = body_radii(params, dtype)
    elas = body_elasticities(params, dtype)
    dt_sub = params.dt / params.substeps

    step = partial(
        _substep, params=params, inv_mass=inv_mass, radii=radii, elas=elas,
        dt_sub=dt_sub,
    )
    (pos, vel, _), _ = jax.lax.scan(
        step, (pos, vel, forces), None, length=params.substeps
    )
    return pos, vel
