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


def _solve_contacts_scalar(
    px: list, py: list, vx: list, vy: list, params: EnvParams,
    inv_m: list, radii_f: list, elas_f: list, dtype,
) -> tuple[list, list]:
    """Spec items 2–3 in scalar SSA form.

    TPU-native layout choice: every quantity is a *scalar* per body/pair
    in single-env semantics, so under ``vmap`` each becomes a dense [B]
    vector — full 8x128 VPU tile utilization. (A [B, n_bodies, 2] layout
    puts ~10 elements on the minor dims and wastes >98% of each lane
    tile; that cost 4-5x in measured throughput.) The unrolled sequential
    loop is pure dataflow — no scatters, no gathers.

    Walls exploit axis-alignment: for bottom/top the contact normal is
    (0, +-1), so the normal impulse touches only vy and friction only vx
    (and symmetrically for left/right) — bit-identical to the generic
    formula, half the flops.
    """
    n_bodies = len(px)
    pairs = circle_pairs(n_bodies)
    zero = jnp.asarray(0.0, dtype)
    one = jnp.asarray(1.0, dtype)
    mu = jnp.asarray(params.friction, dtype)
    slop = jnp.asarray(params.collision_slop, dtype)
    eps = jnp.asarray(1e-12, dtype)
    dt_sub = params.dt / params.substeps
    bias_coef = jnp.asarray(params.baumgarte / dt_sub, dtype)

    # ---- circle–circle precompute (per pair scalars) -------------------
    nx_p, ny_p, act_p, kn_p, bounce_p, vbias_p = [], [], [], [], [], []
    for (i, j) in pairs:
        dpx = px[j] - px[i]
        dpy = py[j] - py[i]
        dist = jnp.sqrt(dpx * dpx + dpy * dpy)
        pen = (radii_f[i] + radii_f[j]) - dist
        inv_d = one / jnp.maximum(dist, eps)
        nx = dpx * inv_d
        ny = dpy * inv_d
        vrn0 = (vx[j] - vx[i]) * nx + (vy[j] - vy[i]) * ny
        nx_p.append(nx)
        ny_p.append(ny)
        act_p.append((pen > 0).astype(dtype))
        kn_p.append(one / (inv_m[i] + inv_m[j]))
        bounce_p.append(elas_f[i] * elas_f[j] * jnp.minimum(vrn0, zero))
        vbias_p.append(bias_coef * jnp.maximum(pen - slop, zero))

    # ---- wall precompute (per body x wall scalars) ----------------------
    # wall order [bottom, top, left, right]; normals (0,1),(0,-1),(1,0),(-1,0)
    w = jnp.asarray(params.width, dtype)
    h = jnp.asarray(params.height, dtype)
    glo = jnp.asarray(params.goal_y_lo, dtype)
    ghi = jnp.asarray(params.goal_y_hi, dtype)
    wact, wbounce, wvbias = [], [], []  # each [4][n_bodies]
    for wi in range(4):
        wact.append([None] * n_bodies)
        wbounce.append([None] * n_bodies)
        wvbias.append([None] * n_bodies)
    neg_one = jnp.asarray(-1.0, dtype)
    for i in range(n_bodies):
        if i == 0:
            in_mouth = (py[i] >= glo) & (py[i] <= ghi)
        d = [
            radii_f[i] - py[i],
            radii_f[i] - (h - py[i]),
            radii_f[i] - px[i],
            radii_f[i] - (w - px[i]),
        ]
        if i == 0:  # ball passes through the goal mouth (spec item 2)
            d[2] = jnp.where(in_mouth, neg_one, d[2])
            d[3] = jnp.where(in_mouth, neg_one, d[3])
        e_w = elas_f[i] * jnp.asarray(params.wall_elasticity, dtype)
        vrn0_w = [vy[i], -vy[i], vx[i], -vx[i]]  # vel · wall normal
        for wi in range(4):
            wact[wi][i] = (d[wi] > 0).astype(dtype)
            wbounce[wi][i] = e_w * jnp.minimum(vrn0_w[wi], zero)
            wvbias[wi][i] = bias_coef * jnp.maximum(d[wi] - slop, zero)

    def one_iteration(_, carry):
        vx = list(carry[0])
        vy = list(carry[1])
        jn_cc = list(carry[2])
        jt_cc = list(carry[3])
        jn_w = [list(r) for r in carry[4]]
        jt_w = [list(r) for r in carry[5]]

        # -- circle–circle, sequential in fixed lexicographic order -----
        for p, (i, j) in enumerate(pairs):
            m = act_p[p]
            nx, ny = nx_p[p], ny_p[p]
            # tangent t = (-ny, nx)
            vrn = (vx[j] - vx[i]) * nx + (vy[j] - vy[i]) * ny
            dj = -kn_p[p] * (vrn + bounce_p[p] - vbias_p[p])
            jn_new = jnp.maximum(jn_cc[p] + dj, zero)
            dj = (jn_new - jn_cc[p]) * m
            jn_cc[p] = jn_cc[p] + dj
            vx[i] = vx[i] - dj * nx * inv_m[i]
            vy[i] = vy[i] - dj * ny * inv_m[i]
            vx[j] = vx[j] + dj * nx * inv_m[j]
            vy[j] = vy[j] + dj * ny * inv_m[j]
            # friction
            vrt = (vx[j] - vx[i]) * (-ny) + (vy[j] - vy[i]) * nx
            djt = -kn_p[p] * vrt
            lim = mu * jn_cc[p]
            jt_new = jnp.clip(jt_cc[p] + djt, -lim, lim)
            djt = (jt_new - jt_cc[p]) * m
            jt_cc[p] = jt_cc[p] + djt
            vx[i] = vx[i] - djt * (-ny) * inv_m[i]
            vy[i] = vy[i] - djt * nx * inv_m[i]
            vx[j] = vx[j] + djt * (-ny) * inv_m[j]
            vy[j] = vy[j] + djt * nx * inv_m[j]

        # -- walls: order [bottom, top, left, right]; bodies independent.
        # Axis-aligned: bottom/top -> normal on vy, friction on vx;
        # left/right -> normal on vx, friction on vy. Signs from normals
        # (0,1),(0,-1),(1,0),(-1,0) and tangents (-1,0),(1,0),(0,1),(0,-1).
        for wi in range(4):
            for i in range(n_bodies):
                m = wact[wi][i]
                if wi == 0:
                    vrn, vrt_sign = vy[i], -1.0   # t=(-1,0): vrt=-vx
                elif wi == 1:
                    vrn, vrt_sign = -vy[i], 1.0   # t=(1,0): vrt=vx
                elif wi == 2:
                    vrn, vrt_sign = vx[i], 1.0    # t=(0,1): vrt=vy
                else:
                    vrn, vrt_sign = -vx[i], -1.0  # t=(0,-1): vrt=-vy
                kn = one / inv_m[i]
                dj = -kn * (vrn + wbounce[wi][i] - wvbias[wi][i])
                jn_new = jnp.maximum(jn_w[wi][i] + dj, zero)
                dj = (jn_new - jn_w[wi][i]) * m
                jn_w[wi][i] = jn_w[wi][i] + dj
                if wi == 0:
                    vy[i] = vy[i] + dj * inv_m[i]
                elif wi == 1:
                    vy[i] = vy[i] - dj * inv_m[i]
                elif wi == 2:
                    vx[i] = vx[i] + dj * inv_m[i]
                else:
                    vx[i] = vx[i] - dj * inv_m[i]
                # friction
                vrt = vrt_sign * (vx[i] if wi < 2 else vy[i])
                djt = -kn * vrt
                lim = mu * jn_w[wi][i]
                jt_new = jnp.clip(jt_w[wi][i] + djt, -lim, lim)
                djt = (jt_new - jt_w[wi][i]) * m
                jt_w[wi][i] = jt_w[wi][i] + djt
                if wi < 2:
                    vx[i] = vx[i] + djt * vrt_sign * inv_m[i]
                else:
                    vy[i] = vy[i] + djt * vrt_sign * inv_m[i]

        return (
            tuple(vx), tuple(vy), tuple(jn_cc), tuple(jt_cc),
            tuple(tuple(r) for r in jn_w), tuple(tuple(r) for r in jt_w),
        )

    # Accumulators are zeros_like a velocity (not 0-d scalars) so the
    # fori_loop carry is shape-stable when the "scalars" are env tiles
    # inside the Pallas fused kernel (vmap broadcasts either way).
    zl = jnp.zeros_like(vx[0])
    init = (
        tuple(vx), tuple(vy),
        tuple(zl for _ in pairs), tuple(zl for _ in pairs),
        tuple(tuple(zl for _ in range(n_bodies)) for _ in range(4)),
        tuple(tuple(zl for _ in range(n_bodies)) for _ in range(4)),
    )
    out = jax.lax.fori_loop(0, params.solver_iterations, one_iteration, init)
    return list(out[0]), list(out[1])


def solve_contacts(
    pos: jax.Array, vel: jax.Array, params: EnvParams,
    inv_mass: jax.Array, radii: jax.Array, elas: jax.Array,
) -> jax.Array:
    """Spec items 2–3: returns post-solve velocities ([N,2] single-env view;
    batch via vmap). Thin array wrapper over the scalar-SSA core."""
    n = pos.shape[0]
    dtype = vel.dtype
    px = [pos[i, 0] for i in range(n)]
    py = [pos[i, 1] for i in range(n)]
    vx = [vel[i, 0] for i in range(n)]
    vy = [vel[i, 1] for i in range(n)]
    inv_m = [inv_mass[i] for i in range(n)]
    radii_f = [radii[i] for i in range(n)]
    elas_f = [elas[i] for i in range(n)]
    vx, vy = _solve_contacts_scalar(
        px, py, vx, vy, params, inv_m, radii_f, elas_f, dtype
    )
    return jnp.stack([jnp.stack(vx), jnp.stack(vy)], axis=-1)


def physics_step_scalars(
    px: list, py: list, vx: list, vy: list, fx: list, fy: list,
    params: EnvParams, dtype,
) -> tuple[list, list, list, list]:
    """The full physics step in scalar-SSA form (the TPU hot path).

    Inputs/outputs are per-body scalar lists — under ``vmap`` each scalar
    is a dense [B] lane vector, so the whole step is pack/unpack-free
    when the caller (env.step) also runs in scalar form. Bit-identical
    to :func:`physics_step`: the same formulas in the same order, applied
    per coordinate.
    """
    n = len(px)
    # Per-body constants as 0-d scalars straight from params (array
    # constants would be captured consts inside the Pallas fused kernel).
    inv_m = [jnp.asarray(1.0 / params.ball_mass, dtype)] + [
        jnp.asarray(1.0 / params.player_mass, dtype)
    ] * (n - 1)
    radii_f = [jnp.asarray(params.ball_radius, dtype)] + [
        jnp.asarray(params.player_radius, dtype)
    ] * (n - 1)
    elas_f = [jnp.asarray(params.ball_elasticity, dtype)] + [
        jnp.asarray(params.player_elasticity, dtype)
    ] * (n - 1)
    dt_sub = params.dt / params.substeps
    dt_c = jnp.asarray(dt_sub, dtype)
    damp = jnp.asarray(params.damping, dtype) ** jnp.asarray(dt_sub, dtype)
    one = jnp.asarray(1.0, dtype)
    eps = jnp.asarray(1e-12, dtype)
    max_sp = jnp.asarray(params.max_speed, dtype)

    def substep(_, carry):
        px, py, vx, vy = (list(t) for t in carry)
        # Spec item 1: velocity integration + speed clamp, per body.
        for i in range(n):
            nvx = vx[i] * damp + fx[i] * inv_m[i] * dt_c
            nvy = vy[i] * damp + fy[i] * inv_m[i] * dt_c
            speed = jnp.sqrt(nvx * nvx + nvy * nvy)
            scale = jnp.minimum(one, max_sp / jnp.maximum(speed, eps))
            vx[i] = nvx * scale
            vy[i] = nvy * scale
        # Spec items 2-3: contacts.
        vx, vy = _solve_contacts_scalar(
            px, py, vx, vy, params, inv_m, radii_f, elas_f, dtype
        )
        # Spec item 4: position integration.
        for i in range(n):
            px[i] = px[i] + vx[i] * dt_c
            py[i] = py[i] + vy[i] * dt_c
        return (tuple(px), tuple(py), tuple(vx), tuple(vy))

    # fori_loop (not scan): Mosaic lowers fori_loop but not scan, so this
    # exact function can be traced inside the Pallas fused-rollout kernel.
    px, py, vx, vy = jax.lax.fori_loop(
        0, params.substeps, substep,
        (tuple(px), tuple(py), tuple(vx), tuple(vy)),
    )
    return list(px), list(py), list(vx), list(vy)


@partial(jax.jit, static_argnames=("params",))
def physics_step(
    pos: jax.Array, vel: jax.Array, forces: jax.Array, params: EnvParams
) -> tuple[jax.Array, jax.Array]:
    """Advance one full env.step of simulated time (= ``params.dt``).

    pos/vel/forces: [n_bodies, 2]. Forces are held constant across the
    ``params.substeps`` sub-steps and implicitly cleared by the caller
    passing fresh forces next step (Chipmunk clears forces post-step).
    Array wrapper over :func:`physics_step_scalars` (single source of
    truth for the integration semantics).
    """
    n = pos.shape[0]
    dtype = pos.dtype
    px = [pos[i, 0] for i in range(n)]
    py = [pos[i, 1] for i in range(n)]
    vx = [vel[i, 0] for i in range(n)]
    vy = [vel[i, 1] for i in range(n)]
    fx = [forces[i, 0] for i in range(n)]
    fy = [forces[i, 1] for i in range(n)]
    px, py, vx, vy = physics_step_scalars(px, py, vx, vy, fx, fy, params, dtype)
    pos = jnp.stack([jnp.stack(px), jnp.stack(py)], axis=-1)
    vel = jnp.stack([jnp.stack(vx), jnp.stack(vy)], axis=-1)
    return pos, vel
