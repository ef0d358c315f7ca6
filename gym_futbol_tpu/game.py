"""Game logic for FutbolEnv: actions, possession, kicks, goals, rewards.

Covers SURVEY.md §2.1 components #4 (action decoding), #6 (possession/kick),
#7 (goal/OOB/reset) and #8 (reward shaping) as pure, branch-free ``jnp``
functions over a single env's state (batch via ``vmap``). The reference
mount was empty at build time (SURVEY.md §0) so the exact constants and
tie-break rules are this module's *normative spec*, chosen to match the
driver's behavioral description (BASELINE.json north_star) and documented
inline; the C++ oracle mirrors them exactly.

ACTION SPEC (normative). Each player emits ``(direction, act)``:

    direction: 0 noop, 1 up (+y), 2 right (+x), 3 down (-y), 4 left (-x)
    act:       0 noop, 1 dash, 2 press, 3 pass, 4 shoot

- direction applies ``move_force`` continuously for the step (dash:
  ``move_force * dash_multiplier``). Force on the *player body* only.
- press: if |player - ball| <= possession_radius, the player bids for
  possession. Among bidders the **nearest** wins; ties break to the
  lowest body index. A current owner who no longer is within
  possession_radius of the ball loses possession even without a bid.
- pass: owner only. Ball gets impulse ``pass_power`` toward the nearest
  teammate (noisy angle), possession released.
- shoot: owner only. Impulse ``shoot_power`` toward the center of the
  opponent goal mouth (noisy angle), possession released.
- dribble: while owned, the ball is carried: placed ``player_radius +
  ball_radius + dribble_offset`` from the owner's center along the
  owner's commanded direction (or +x/-x by team if no direction), with
  the owner's velocity.

GOAL SPEC: team 0 attacks the right goal (x = width). A goal for team k
occurs when the ball's *center* crosses the opposing goal line while its
y is within the mouth [goal_y_lo, goal_y_hi]. Scoring triggers a kickoff
re-placement (positions/velocities/possession reset; score and clock kept).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .types import EnvParams, EnvState

# Direction unit vectors as Python constants for branch-free scalar
# decode, index 0 = noop. +y is "up". (Plain tuples, not jnp arrays: a
# module-level device array would initialize the XLA backend at import
# time and break jax.distributed.initialize in multi-process runs.)
_DIR_X = (0.0, 0.0, 1.0, 0.0, -1.0)
_DIR_Y = (0.0, 1.0, 0.0, -1.0, 0.0)

ACT_NOOP, ACT_DASH, ACT_PRESS, ACT_PASS, ACT_SHOOT = 0, 1, 2, 3, 4


# ---------------------------------------------------------------------------
# TPU-friendly selection primitives
#
# Dynamic gathers like ``pos[owner]`` become per-env gather ops on
# [B, n_bodies, 2] under vmap — on TPU these are layout-hostile and were
# measured (parity/ablate_step.py) at ~200 us/step each in the fused
# program, an order of magnitude above their flop cost. With n <= 11
# bodies, a one-hot masked sum over STATIC slices is bit-exact (adding
# zeros and multiplying by 1.0 are exact in IEEE754) and compiles to a
# handful of dense [B]-wide VPU ops instead.
# ---------------------------------------------------------------------------


def _select_row(table: jax.Array, idx: jax.Array, lo: int, hi: int) -> jax.Array:
    """table[idx] for idx in [lo, hi) via one-hot sum of static rows.
    Exact: contributes table[idx] * 1.0 plus zeros."""
    out = jnp.zeros_like(table[lo])
    for i in range(lo, hi):
        out = out + jnp.where(idx == i, table[i], jnp.zeros_like(table[i]))
    return out


def _select_scalar(values: jax.Array, idx: jax.Array, lo: int, hi: int) -> jax.Array:
    """values[idx] (0-d result) via chained where over static entries."""
    out = values[lo]
    for i in range(lo + 1, hi):
        out = jnp.where(idx == i, values[i], out)
    return out


# ---------------------------------------------------------------------------
# Action decoding -> forces
# ---------------------------------------------------------------------------


def _dir_unit(direction: jax.Array, dtype) -> tuple[jax.Array, jax.Array]:
    """Direction index -> unit vector, branch-free (no table gather)."""
    one = jnp.asarray(1.0, dtype)
    zero = jnp.asarray(0.0, dtype)
    ux = jnp.where(direction == 2, one, jnp.where(direction == 4, -one, zero))
    uy = jnp.where(direction == 1, one, jnp.where(direction == 3, -one, zero))
    return ux, uy


def decode_forces_scalars(
    dirs: list, acts: list, params: EnvParams, dtype
) -> tuple[list, list]:
    """Scalar-form action decode: per-body force scalars (fx, fy) lists,
    ball first (zero). ``dirs``/``acts`` are per-player int scalars. Under
    vmap each scalar is a dense [B] vector — no [B, n_bodies, 2]
    intermediates (see parity/ablate_step.py). Shared verbatim by the
    Pallas fused-rollout kernel (each scalar is an [8,128] env tile there).
    """
    zero = jnp.asarray(0.0, dtype)
    mf = jnp.asarray(params.move_force, dtype)
    mfd = jnp.asarray(params.move_force * params.dash_multiplier, dtype)
    fx, fy = [zero], [zero]
    for p in range(2 * params.players_per_team):
        ux, uy = _dir_unit(dirs[p], dtype)
        mag = jnp.where(acts[p] == ACT_DASH, mfd, mf)
        fx.append(ux * mag)
        fy.append(uy * mag)
    return fx, fy


def split_actions(actions: jax.Array, params: EnvParams) -> tuple[list, list]:
    """[n_players, 2] action array -> (dirs, acts) per-player scalar lists."""
    n_players = 2 * params.players_per_team
    dirs = [actions[p, 0] for p in range(n_players)]
    acts = [actions[p, 1] for p in range(n_players)]
    return dirs, acts


def decode_forces(actions: jax.Array, params: EnvParams, dtype) -> jax.Array:
    """[n_players, 2] int actions -> [n_bodies, 2] forces (ball row = 0).

    SURVEY.md §3.3: "decode per-agent discrete action -> forces/impulses".
    Array wrapper over :func:`decode_forces_scalars`.
    """
    dirs, acts = split_actions(actions, params)
    fx, fy = decode_forces_scalars(dirs, acts, params, dtype)
    return jnp.stack([jnp.stack(fx), jnp.stack(fy)], axis=-1)


# ---------------------------------------------------------------------------
# Possession
# ---------------------------------------------------------------------------


def update_possession_scalars(
    px: list, py: list, possession: jax.Array, acts: list,
    params: EnvParams, dtype,
) -> jax.Array:
    """Resolve possession bids (ACTION SPEC above) in scalar form.
    Returns new owner body index ([] int32, -1 = loose ball)."""
    n_players = 2 * params.players_per_team
    bx, by = px[0], py[0]
    radius = jnp.asarray(params.possession_radius, dtype)
    big = jnp.asarray(jnp.finfo(dtype).max, dtype)

    d, within, bids = [], [], []
    for p in range(n_players):
        dx = px[1 + p] - bx
        dy = py[1 + p] - by
        dp = jnp.sqrt(dx * dx + dy * dy)
        w = dp <= radius
        d.append(dp)
        within.append(w)
        bids.append((acts[p] == ACT_PRESS) & w)

    # nearest bidder wins; ties -> lowest player index (strict < keeps
    # the earlier index on ties, matching argmin semantics)
    best = jnp.asarray(0, jnp.int32)
    best_d = jnp.where(bids[0], d[0], big)
    any_bid = bids[0]
    for p in range(1, n_players):
        bd = jnp.where(bids[p], d[p], big)
        take = bd < best_d
        best = jnp.where(take, jnp.asarray(p, jnp.int32), best)
        best_d = jnp.where(take, bd, best_d)
        any_bid = any_bid | bids[p]
    bid_winner = best + 1                                    # player idx -> body idx

    # Current owner keeps the ball only while in reach. The select chain
    # runs on int32 0/1 flags, not bool values — Mosaic (the Pallas TPU
    # compiler, which traces this function inside the fused kernel) does
    # not lower selects whose *values* are i1 vectors.
    owner_player = possession - 1
    owner_within = within[0].astype(jnp.int32)
    for p in range(1, n_players):
        owner_within = jnp.where(
            owner_player == p, within[p].astype(jnp.int32), owner_within
        )
    keep = jnp.where(
        (possession > 0) & (owner_within > 0),
        possession, jnp.asarray(-1, jnp.int32),
    )
    return jnp.where(any_bid, bid_winner, keep)


def update_possession(
    state_pos: jax.Array, possession: jax.Array, actions: jax.Array,
    params: EnvParams,
) -> jax.Array:
    """Array wrapper over :func:`update_possession_scalars`."""
    n = state_pos.shape[0]
    px = [state_pos[i, 0] for i in range(n)]
    py = [state_pos[i, 1] for i in range(n)]
    _, acts = split_actions(actions, params)
    return update_possession_scalars(
        px, py, possession, acts, params, state_pos.dtype
    )


# ---------------------------------------------------------------------------
# Kicks (pass / shoot)
# ---------------------------------------------------------------------------


def _rot(v: jax.Array, theta: jax.Array) -> jax.Array:
    c, s = jnp.cos(theta), jnp.sin(theta)
    return jnp.stack([c * v[0] - s * v[1], s * v[0] + c * v[1]])


def apply_kick_scalars(
    px: list, py: list, vx: list, vy: list, possession: jax.Array,
    acts: list, theta: jax.Array, params: EnvParams, dtype,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Owner's pass/shoot in scalar form (no dynamic body gathers).

    ``theta`` is the pre-drawn angular noise (standard normal already
    scaled by ``params.kick_noise``) — injected rather than drawn here so
    the jnp path (jax.random) and the Pallas fused kernel (on-core PRNG)
    share this function verbatim. Returns (ball dvx, ball dvy, new
    possession) — the caller adds the deltas into the ball's velocity
    scalars.
    """
    ppt = params.players_per_team
    n_players = 2 * ppt
    eps = jnp.asarray(1e-9, dtype)
    zero = jnp.asarray(0.0, dtype)

    has_owner = possession > 0
    owner_p = jnp.clip(possession - 1, 0, n_players - 1)     # player index
    owner_act = acts[0]
    for p in range(1, n_players):
        owner_act = jnp.where(owner_p == p, acts[p], owner_act)
    do_pass = has_owner & (owner_act == ACT_PASS)
    do_shoot = has_owner & (owner_act == ACT_SHOOT)

    # owner position: one-hot select over static slices (body index;
    # falls back to the ball row when unowned, like pos[possession.clip(0)])
    ox, oy = px[0], py[0]
    for b in range(1, n_players + 1):
        ox = jnp.where(possession == b, px[b], ox)
        oy = jnp.where(possession == b, py[b], oy)
    owner_team = (owner_p >= ppt).astype(jnp.int32)          # 0 or 1
    bx, by = px[0], py[0]

    # shoot target: opponent goal mouth center
    goal_x = jnp.where(
        owner_team == 0, jnp.asarray(params.width, dtype), zero
    )
    sdx = goal_x - bx
    sdy = jnp.asarray(params.height / 2.0, dtype) - by
    snorm = jnp.maximum(jnp.sqrt(sdx * sdx + sdy * sdy), eps)
    sdx, sdy = sdx / snorm, sdy / snorm

    # pass target: nearest teammate of the owner (strict < keeps the
    # earlier index on ties, matching argmin)
    big = jnp.asarray(jnp.finfo(dtype).max, dtype)
    mate_d = big
    mx, my = px[1], py[1]
    has_mate = jnp.asarray(False)
    for p in range(n_players):
        team_p = 1 if p >= ppt else 0
        dx = px[1 + p] - ox
        dy = py[1 + p] - oy
        dp = jnp.sqrt(dx * dx + dy * dy)
        is_mate = (owner_team == team_p) & (owner_p != p)
        dp = jnp.where(is_mate, dp, big)
        take = dp < mate_d
        mx = jnp.where(take, px[1 + p], mx)
        my = jnp.where(take, py[1 + p], my)
        mate_d = jnp.where(take, dp, mate_d)
        has_mate = has_mate | is_mate
    pdx = mx - bx
    pdy = my - by
    pnorm = jnp.maximum(jnp.sqrt(pdx * pdx + pdy * pdy), eps)
    pdx, pdy = pdx / pnorm, pdy / pnorm
    # 1v1 has no teammate: fall back to shooting direction
    pdx = jnp.where(has_mate, pdx, sdx)
    pdy = jnp.where(has_mate, pdy, sdy)

    c, s = jnp.cos(theta), jnp.sin(theta)
    kdx = jnp.where(do_shoot, c * sdx - s * sdy, c * pdx - s * pdy)
    kdy = jnp.where(do_shoot, s * sdx + c * sdy, s * pdx + c * pdy)
    power = jnp.where(
        do_shoot, jnp.asarray(params.shoot_power, dtype),
        jnp.asarray(params.pass_power, dtype),
    )
    kicked = do_pass | do_shoot
    impulse = jnp.where(kicked, power, zero)
    bm = jnp.asarray(params.ball_mass, dtype)
    dvx = jnp.where(kicked, kdx * impulse / bm, zero)
    dvy = jnp.where(kicked, kdy * impulse / bm, zero)
    possession = jnp.where(kicked, jnp.asarray(-1, jnp.int32), possession)
    return dvx, dvy, possession


def apply_kick(
    pos: jax.Array, vel: jax.Array, possession: jax.Array,
    actions: jax.Array, key: jax.Array, params: EnvParams,
) -> tuple[jax.Array, jax.Array]:
    """Owner's pass/shoot -> ball impulse + possession release.

    Returns (new ball velocity applied into vel, new possession).
    Array wrapper over :func:`apply_kick_scalars`.
    """
    n = pos.shape[0]
    dtype = pos.dtype
    px = [pos[i, 0] for i in range(n)]
    py = [pos[i, 1] for i in range(n)]
    vx = [vel[i, 0] for i in range(n)]
    vy = [vel[i, 1] for i in range(n)]
    _, acts = split_actions(actions, params)
    theta = jax.random.normal(key, (), dtype) * jnp.asarray(
        params.kick_noise, dtype
    )
    dvx, dvy, possession = apply_kick_scalars(
        px, py, vx, vy, possession, acts, theta, params, dtype
    )
    vel = vel.at[0].add(jnp.stack([dvx, dvy]))
    return vel, possession


# ---------------------------------------------------------------------------
# Dribble coupling
# ---------------------------------------------------------------------------


def apply_dribble_scalars(
    px: list, py: list, vx: list, vy: list, possession: jax.Array,
    dirs: list, params: EnvParams, dtype,
) -> tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Carry the ball with its owner, scalar form (ACTION SPEC).
    Returns the ball's new (px, py, vx, vy) scalars."""
    ppt = params.players_per_team
    n_players = 2 * ppt
    has_owner = possession > 0
    owner_p = jnp.clip(possession - 1, 0, n_players - 1)

    direction = dirs[0]
    for p in range(1, n_players):
        direction = jnp.where(owner_p == p, dirs[p], direction)
    ux, uy = _dir_unit(direction, dtype)
    # facing fallback: team 0 faces +x, team 1 faces -x
    owner_team = (owner_p >= ppt).astype(jnp.int32)
    one = jnp.asarray(1.0, dtype)
    fbx = jnp.where(owner_team == 0, one, -one)
    moving = (ux != 0) | (uy != 0)
    cdx = jnp.where(moving, ux, fbx)
    cdy = jnp.where(moving, uy, jnp.asarray(0.0, dtype))

    # owner position/velocity: one-hot select over static slices
    ox, oy, ovx, ovy = px[0], py[0], vx[0], vy[0]
    for b in range(1, n_players + 1):
        is_b = possession == b
        ox = jnp.where(is_b, px[b], ox)
        oy = jnp.where(is_b, py[b], oy)
        ovx = jnp.where(is_b, vx[b], ovx)
        ovy = jnp.where(is_b, vy[b], ovy)

    offset = jnp.asarray(
        params.player_radius + params.ball_radius + params.dribble_offset, dtype
    )
    ball_px = jnp.where(has_owner, ox + cdx * offset, px[0])
    ball_py = jnp.where(has_owner, oy + cdy * offset, py[0])
    ball_vx = jnp.where(has_owner, ovx, vx[0])
    ball_vy = jnp.where(has_owner, ovy, vy[0])
    return ball_px, ball_py, ball_vx, ball_vy


def apply_dribble(
    pos: jax.Array, vel: jax.Array, possession: jax.Array,
    actions: jax.Array, params: EnvParams,
) -> tuple[jax.Array, jax.Array]:
    """Carry the ball with its owner (post-physics override, ACTION SPEC).
    Array wrapper over :func:`apply_dribble_scalars`."""
    n = pos.shape[0]
    px = [pos[i, 0] for i in range(n)]
    py = [pos[i, 1] for i in range(n)]
    vx = [vel[i, 0] for i in range(n)]
    vy = [vel[i, 1] for i in range(n)]
    dirs, _ = split_actions(actions, params)
    bpx, bpy, bvx, bvy = apply_dribble_scalars(
        px, py, vx, vy, possession, dirs, params, pos.dtype
    )
    return (
        pos.at[0].set(jnp.stack([bpx, bpy])),
        vel.at[0].set(jnp.stack([bvx, bvy])),
    )


# ---------------------------------------------------------------------------
# Goals, OOB, kickoff reset
# ---------------------------------------------------------------------------


def detect_goal_scalars(
    ball_x: jax.Array, ball_y: jax.Array, params: EnvParams
) -> tuple[jax.Array, jax.Array]:
    """(team0_scored, team1_scored) bool scalars. GOAL SPEC above."""
    in_mouth = (ball_y >= params.goal_y_lo) & (ball_y <= params.goal_y_hi)
    g0 = (ball_x > params.width) & in_mouth   # team 0 scores on right goal
    g1 = (ball_x < 0.0) & in_mouth            # team 1 scores on left goal
    return g0, g1


def detect_goal(pos: jax.Array, params: EnvParams) -> jax.Array:
    """[2] bool: goal scored by team 0 (ball past right line), team 1 (left).

    GOAL SPEC above; SURVEY.md §3.3 "goal check: ball x beyond goal line
    within goal mouth".
    """
    g0, g1 = detect_goal_scalars(pos[0, 0], pos[0, 1], params)
    return jnp.stack([g0, g1])


def clamp_oob_scalars(
    px: list, py: list, vx: list, vy: list, params: EnvParams, dtype,
) -> tuple[list, list, list, list, jax.Array]:
    """Clamp bodies into the field, scalar form. Returns updated lists +
    ball_was_clamped. Semantics as :func:`clamp_oob`."""
    n = len(px)
    zero = jnp.asarray(0.0, dtype)
    w = jnp.asarray(params.width, dtype)
    h = jnp.asarray(params.height, dtype)
    px, py, vx, vy = list(px), list(py), list(vx), list(vy)

    ball_y = py[0]
    in_mouth = (ball_y >= params.goal_y_lo) & (ball_y <= params.goal_y_hi)

    ball_was_clamped = None
    for i in range(n):
        r = jnp.asarray(
            params.ball_radius if i == 0 else params.player_radius, dtype
        )
        cx = jnp.clip(px[i], r, w - r)
        cy = jnp.clip(py[i], r, h - r)
        if i == 0:
            cx = jnp.where(in_mouth, px[0], cx)  # free x inside the mouth
        moved_x = jnp.abs(cx - px[i]) > 0
        moved_y = jnp.abs(cy - py[i]) > 0
        # zero the velocity component that got clamped (plastic wall)
        vx[i] = jnp.where(moved_x, zero, vx[i])
        vy[i] = jnp.where(moved_y, zero, vy[i])
        px[i], py[i] = cx, cy
        if i == 0:
            ball_was_clamped = moved_x | moved_y
    return px, py, vx, vy, ball_was_clamped


def clamp_oob(
    pos: jax.Array, vel: jax.Array, params: EnvParams
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Clamp bodies into the field (SURVEY.md §3.3 'out-of-bounds clamping').

    Players are always clamped. The ball is clamped in y, and in x only
    outside the goal mouth (a ball inside the mouth is about to be a
    goal). Returns (pos, vel, ball_was_clamped). Array wrapper over
    :func:`clamp_oob_scalars`.
    """
    n = pos.shape[0]
    px = [pos[i, 0] for i in range(n)]
    py = [pos[i, 1] for i in range(n)]
    vx = [vel[i, 0] for i in range(n)]
    vy = [vel[i, 1] for i in range(n)]
    px, py, vx, vy, ball_was_clamped = clamp_oob_scalars(
        px, py, vx, vy, params, pos.dtype
    )
    out = jnp.stack([jnp.stack(px), jnp.stack(py)], axis=-1)
    new_vel = jnp.stack([jnp.stack(vx), jnp.stack(vy)], axis=-1)
    return out, new_vel, ball_was_clamped


def kickoff_scalars(
    noise_x: list, noise_y: list, params: EnvParams, dtype
) -> tuple[list, list]:
    """Kickoff placement in scalar form: ball at center, teams in mirrored
    columns at width/4 and 3*width/4 spread in y, all jittered by
    ``placement_noise * height * noise`` where ``noise_x/noise_y`` are
    per-body uniforms in [-1, 1] (ball first). Shared by the jnp path
    (jax.random noise) and the Pallas fused kernel (on-core PRNG noise).
    Returns (px, py) per-body scalar lists; velocities are zero."""
    ppt = params.players_per_team
    w, h = params.width, params.height
    amp = jnp.asarray(params.placement_noise * h, dtype)

    px = [jnp.asarray(w / 2.0, dtype) + noise_x[0] * amp]
    py = [jnp.asarray(h / 2.0, dtype) + noise_y[0] * amp]
    for team, base_x in ((0, w / 4.0), (1, 3.0 * w / 4.0)):
        for k in range(ppt):
            b = 1 + team * ppt + k
            y0 = (k + 1.0) * (h / (ppt + 1.0))
            px.append(jnp.asarray(base_x, dtype) + noise_x[b] * amp)
            py.append(jnp.asarray(y0, dtype) + noise_y[b] * amp)
    return px, py


def kickoff_positions(
    key: jax.Array, params: EnvParams, dtype=jnp.float32
) -> tuple[jax.Array, jax.Array]:
    """Initial / post-goal placement (SURVEY.md §3.2). Array wrapper over
    :func:`kickoff_scalars` with jax.random noise.
    Returns (pos [n_bodies,2], vel zeros)."""
    n = params.n_bodies
    noise = jax.random.uniform(key, (n, 2), dtype, -1.0, 1.0)
    px, py = kickoff_scalars(
        [noise[i, 0] for i in range(n)], [noise[i, 1] for i in range(n)],
        params, dtype,
    )
    pos = jnp.stack([jnp.stack(px), jnp.stack(py)], axis=-1)
    return pos, jnp.zeros_like(pos)


# ---------------------------------------------------------------------------
# Rewards
# ---------------------------------------------------------------------------


def _ball_goal_dist_scalar(
    bx: jax.Array, by: jax.Array, params: EnvParams, team: int, dtype
) -> jax.Array:
    """Distance from ball to the goal *team* attacks."""
    gx = jnp.asarray(params.width if team == 0 else 0.0, dtype)
    gy = jnp.asarray(params.height / 2.0, dtype)
    dx = bx - gx
    dy = by - gy
    return jnp.sqrt(dx * dx + dy * dy)


def _nearest_player_ball_dist_scalar(
    px: list, py: list, params: EnvParams, team: int
) -> jax.Array:
    ppt = params.players_per_team
    lo = 1 + team * ppt
    best = None
    for b in range(lo, lo + ppt):
        dx = px[b] - px[0]
        dy = py[b] - py[0]
        d = jnp.sqrt(dx * dx + dy * dy)
        best = d if best is None else jnp.minimum(best, d)
    return best


def shaped_rewards_scalars(
    px0: list, py0: list, px1: list, py1: list, possession: jax.Array,
    goal0: jax.Array, goal1: jax.Array, ball_clamped: jax.Array,
    params: EnvParams, dtype,
) -> tuple[jax.Array, jax.Array]:
    """Per-team shaped reward in scalar form; (team0, team1) scalars.
    Coefficient semantics as :func:`shaped_rewards`."""
    rc = params.rewards
    ppt = params.players_per_team
    goals = (goal0, goal1)

    rews = []
    for team in (0, 1):
        r = jnp.asarray(rc.time_penalty, dtype)
        # terminal goal terms
        r = r + jnp.where(goals[team], jnp.asarray(rc.goal, dtype), 0.0)
        r = r + jnp.where(goals[1 - team], jnp.asarray(rc.concede, dtype), 0.0)
        # ball progressed toward the goal we attack
        d0 = _ball_goal_dist_scalar(px0[0], py0[0], params, team, dtype)
        d1 = _ball_goal_dist_scalar(px1[0], py1[0], params, team, dtype)
        r = r + jnp.asarray(rc.ball_to_goal_delta, dtype) * (d0 - d1)
        # nearest player closed on the ball
        p0 = _nearest_player_ball_dist_scalar(px0, py0, params, team)
        p1 = _nearest_player_ball_dist_scalar(px1, py1, params, team)
        r = r + jnp.asarray(rc.player_to_ball_delta, dtype) * (p0 - p1)
        # possession
        owner_p = possession - 1
        owns = (possession > 0) & (
            (owner_p >= team * ppt) & (owner_p < (team + 1) * ppt)
        )
        r = r + jnp.where(owns, jnp.asarray(rc.possession_bonus, dtype), 0.0)
        # ball forced back in bounds
        r = r + jnp.where(ball_clamped, jnp.asarray(rc.oob_penalty, dtype), 0.0)
        rews.append(r)
    return rews[0], rews[1]


def shaped_rewards(
    pos_before: jax.Array, pos_after: jax.Array, possession: jax.Array,
    goals: jax.Array, ball_clamped: jax.Array, params: EnvParams,
) -> jax.Array:
    """[2] per-team shaped reward (SURVEY.md §2.1 #8; coefficients in
    :class:`RewardConfig` are our spec, driver-compatible). Array wrapper
    over :func:`shaped_rewards_scalars`."""
    dtype = pos_before.dtype
    n = pos_before.shape[0]
    px0 = [pos_before[i, 0] for i in range(n)]
    py0 = [pos_before[i, 1] for i in range(n)]
    px1 = [pos_after[i, 0] for i in range(n)]
    py1 = [pos_after[i, 1] for i in range(n)]
    r0, r1 = shaped_rewards_scalars(
        px0, py0, px1, py1, possession, goals[0], goals[1], ball_clamped,
        params, dtype,
    )
    return jnp.stack([r0, r1])
