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

   Inactive contacts contribute exactly zero. Wall contacts of one wall
   touch disjoint bodies against a static wall, so they are
   mathematically order-independent and are applied as one vectorized
   update per wall.

   **Hot-form algebra (normative FP association).** The implementation
   (and the C++ oracle, identically) evaluates the scheme above in an
   exact-algebra refactoring that removes ~1/3 of the per-iteration VPU
   ops; same real-arithmetic semantics, and the FLOATING-POINT
   association below is itself normative (oracle and Pallas kernels
   mirror it operation-for-operation):

   - ``inv_d = rsqrt(max(d2, 1e-12)); dist = d2 * inv_d`` — one
     transcendental instead of sqrt + divide (on CPU ``rsqrt`` is
     bit-identical to ``1/sqrt``, which is what the oracle computes).
     The degenerate-overlap guard therefore engages at ``dist <= 1e-6``
     (was 1e-12) — both normals are garbage in that regime and the
     states never reach it.
   - *Inactive-contact sentinel*: instead of masking each iteration's
     impulse by ``active``, inactive contacts precompute their velocity
     target ``bmv = bounce - v_bias`` as ``+1e20``; then
     ``jn' = max(jn + -k_n*(vrn + 1e20), 0) = 0`` every iteration and
     the normal AND friction impulses stay exactly 0 (friction clamps
     to ``±mu*jn = 0``) with no per-iteration mask multiplies.
   - *Premultiplied normals*: ``nx*inv_m_a`` etc. are hoisted out of
     the iteration loop; velocity updates are single multiplies.
   - ``jn_acc`` is carried as the rename ``jn_acc = jn'`` (not
     ``jn_acc += dj``); bit-identical for active contacts up to the
     removed mask multiply.
   - *Walls in velocity units*: a wall contact has ``k_n = m_i``, so
     tracking the accumulated impulse as ``jv = jn * inv_m`` (velocity
     units) cancels both the ``k_n`` multiply and the ``inv_m``
     multiply: ``jv' = max(jv - (vrn + bmv), 0)``; friction clamp
     ``|jtv| <= mu * jv`` is the same Coulomb cone in velocity units.

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
    """Spec item 1. vel/forces [N,2], inv_mass [N]. Hot-form algebra:
    ``scale = min(1, max_speed * rsqrt(max(|v|^2, 1e-12)))`` — the oracle
    mirrors this as ``max_speed * (1.0 / sqrt(...))`` (bit-identical on
    CPU)."""
    dtype = vel.dtype
    damp = jnp.asarray(params.damping, dtype) ** jnp.asarray(dt_sub, dtype)
    v = vel * damp + forces * inv_mass[:, None] * jnp.asarray(dt_sub, dtype)
    s2 = jnp.sum(v * v, axis=-1, keepdims=True)
    scale = jnp.minimum(
        jnp.asarray(1.0, dtype),
        jnp.asarray(params.max_speed, dtype)
        * jax.lax.rsqrt(jnp.maximum(s2, 1e-12)),
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
    eps2 = jnp.asarray(1e-12, dtype)
    big = jnp.asarray(1e20, dtype)        # inactive-contact sentinel
    neg_big = jnp.asarray(-1e20, dtype)
    dt_sub = params.dt / params.substeps
    bias_coef = jnp.asarray(params.baumgarte / dt_sub, dtype)

    # ---- circle–circle precompute (per pair scalars; hot-form algebra,
    # see module docstring spec item 3) --------------------------------
    nx_p, ny_p = [], []                   # unit normals (for vrn/vrt)
    nxi_p, nyi_p, nxj_p, nyj_p = [], [], [], []   # inv-mass-premultiplied
    nkn_p, bmv_p = [], []                 # -k_n; bounce - v_bias | +BIG
    for (i, j) in pairs:
        dpx = px[j] - px[i]
        dpy = py[j] - py[i]
        d2 = dpx * dpx + dpy * dpy
        inv_d = jax.lax.rsqrt(jnp.maximum(d2, eps2))
        dist = d2 * inv_d
        pen = (radii_f[i] + radii_f[j]) - dist
        nx = dpx * inv_d
        ny = dpy * inv_d
        vrn0 = (vx[j] - vx[i]) * nx + (vy[j] - vy[i]) * ny
        bounce = elas_f[i] * elas_f[j] * jnp.minimum(vrn0, zero)
        vbias = bias_coef * jnp.maximum(pen - slop, zero)
        nx_p.append(nx)
        ny_p.append(ny)
        nxi_p.append(nx * inv_m[i])
        nyi_p.append(ny * inv_m[i])
        nxj_p.append(nx * inv_m[j])
        nyj_p.append(ny * inv_m[j])
        nkn_p.append(-(one / (inv_m[i] + inv_m[j])))
        bmv_p.append(jnp.where(pen > 0, bounce - vbias, big))

    # ---- wall precompute (per body x wall scalars) ----------------------
    # wall order [bottom, top, left, right]; normals (0,1),(0,-1),(1,0),(-1,0)
    # Stored NEGATED (v_bias - bounce) so the iteration's velocity-units
    # target is one subtract; inactive sentinel is -BIG.
    w = jnp.asarray(params.width, dtype)
    h = jnp.asarray(params.height, dtype)
    glo = jnp.asarray(params.goal_y_lo, dtype)
    ghi = jnp.asarray(params.goal_y_hi, dtype)
    wnbmv = [[None] * n_bodies for _ in range(4)]  # [4][n_bodies]
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
            wbounce = e_w * jnp.minimum(vrn0_w[wi], zero)
            wvbias = bias_coef * jnp.maximum(d[wi] - slop, zero)
            wnbmv[wi][i] = jnp.where(d[wi] > 0, wvbias - wbounce, neg_big)

    def one_iteration(_, carry):
        vx = list(carry[0])
        vy = list(carry[1])
        jn_cc = list(carry[2])
        jt_cc = list(carry[3])
        jv_w = [list(r) for r in carry[4]]   # wall normal acc, velocity units
        jtv_w = [list(r) for r in carry[5]]  # wall friction acc, velocity units

        # -- circle–circle, sequential in fixed lexicographic order -----
        for p, (i, j) in enumerate(pairs):
            nx, ny = nx_p[p], ny_p[p]
            nxi, nyi, nxj, nyj = nxi_p[p], nyi_p[p], nxj_p[p], nyj_p[p]
            # tangent t = (-ny, nx)
            vrn = (vx[j] - vx[i]) * nx + (vy[j] - vy[i]) * ny
            jn_new = jnp.maximum(jn_cc[p] + nkn_p[p] * (vrn + bmv_p[p]), zero)
            dj = jn_new - jn_cc[p]
            jn_cc[p] = jn_new
            vx[i] = vx[i] - dj * nxi
            vy[i] = vy[i] - dj * nyi
            vx[j] = vx[j] + dj * nxj
            vy[j] = vy[j] + dj * nyj
            # friction
            vrt = (vy[j] - vy[i]) * nx - (vx[j] - vx[i]) * ny
            djt = nkn_p[p] * vrt
            lim = mu * jn_new
            jt_new = jnp.clip(jt_cc[p] + djt, -lim, lim)
            djt = jt_new - jt_cc[p]
            jt_cc[p] = jt_new
            vx[i] = vx[i] + djt * nyi
            vy[i] = vy[i] - djt * nxi
            vx[j] = vx[j] - djt * nyj
            vy[j] = vy[j] + djt * nxj

        # -- walls: order [bottom, top, left, right]; bodies independent.
        # Velocity-units form (k_n = m_i cancels inv_m; see docstring).
        # Axis-aligned: bottom/top -> normal on vy, friction on vx;
        # left/right -> normal on vx, friction on vy. Signs from normals
        # (0,1),(0,-1),(1,0),(-1,0) and tangents (-1,0),(1,0),(0,1),(0,-1).
        for wi in range(4):
            for i in range(n_bodies):
                # dv0 = -(vrn + bmv) = wnbmv - vrn, sign-folded per wall
                if wi == 0:
                    dv0 = wnbmv[wi][i] - vy[i]
                elif wi == 1:
                    dv0 = wnbmv[wi][i] + vy[i]
                elif wi == 2:
                    dv0 = wnbmv[wi][i] - vx[i]
                else:
                    dv0 = wnbmv[wi][i] + vx[i]
                jv_new = jnp.maximum(jv_w[wi][i] + dv0, zero)
                dv = jv_new - jv_w[wi][i]
                jv_w[wi][i] = jv_new
                if wi == 0:
                    vy[i] = vy[i] + dv
                elif wi == 1:
                    vy[i] = vy[i] - dv
                elif wi == 2:
                    vx[i] = vx[i] + dv
                else:
                    vx[i] = vx[i] - dv
                # friction: dvt0 = -vrt, sign-folded per wall tangent
                if wi == 0:
                    dvt0 = vx[i]          # vrt = -vx
                elif wi == 1:
                    dvt0 = -vx[i]         # vrt = vx
                elif wi == 2:
                    dvt0 = -vy[i]         # vrt = vy
                else:
                    dvt0 = vy[i]          # vrt = -vy
                limv = mu * jv_new
                jt_new = jnp.clip(jtv_w[wi][i] + dvt0, -limv, limv)
                dvt = jt_new - jtv_w[wi][i]
                jtv_w[wi][i] = jt_new
                # vel += t * dvt with t = (-1,0),(1,0),(0,1),(0,-1)
                if wi == 0:
                    vx[i] = vx[i] - dvt
                elif wi == 1:
                    vx[i] = vx[i] + dvt
                elif wi == 2:
                    vy[i] = vy[i] + dvt
                else:
                    vy[i] = vy[i] - dvt

        return (
            tuple(vx), tuple(vy), tuple(jn_cc), tuple(jt_cc),
            tuple(tuple(r) for r in jv_w), tuple(tuple(r) for r in jtv_w),
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
    eps2 = jnp.asarray(1e-12, dtype)
    max_sp = jnp.asarray(params.max_speed, dtype)

    def substep(_, carry):
        px, py, vx, vy = (list(t) for t in carry)
        # Spec item 1: velocity integration + speed clamp, per body
        # (hot-form: rsqrt on |v|^2, see integrate_velocity).
        for i in range(n):
            nvx = vx[i] * damp + fx[i] * inv_m[i] * dt_c
            nvy = vy[i] * damp + fy[i] * inv_m[i] * dt_c
            s2 = nvx * nvx + nvy * nvy
            scale = jnp.minimum(
                one, max_sp * jax.lax.rsqrt(jnp.maximum(s2, eps2))
            )
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
