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

# Direction unit vectors, index 0 = noop. +y is "up".
_DIRS = jnp.asarray(
    [[0.0, 0.0], [0.0, 1.0], [1.0, 0.0], [0.0, -1.0], [-1.0, 0.0]]
)

ACT_NOOP, ACT_DASH, ACT_PRESS, ACT_PASS, ACT_SHOOT = 0, 1, 2, 3, 4


# ---------------------------------------------------------------------------
# Action decoding -> forces
# ---------------------------------------------------------------------------


def decode_forces(actions: jax.Array, params: EnvParams, dtype) -> jax.Array:
    """[n_players, 2] int actions -> [n_bodies, 2] forces (ball row = 0).

    SURVEY.md §3.3: "decode per-agent discrete action -> forces/impulses".
    """
    direction = actions[:, 0]
    act = actions[:, 1]
    unit = _DIRS.astype(dtype)[direction]                    # [P,2]
    mag = jnp.where(
        act == ACT_DASH,
        jnp.asarray(params.move_force * params.dash_multiplier, dtype),
        jnp.asarray(params.move_force, dtype),
    )
    player_forces = unit * mag[:, None]
    ball_row = jnp.zeros((1, 2), dtype)
    return jnp.concatenate([ball_row, player_forces], axis=0)


# ---------------------------------------------------------------------------
# Possession
# ---------------------------------------------------------------------------


def update_possession(
    state_pos: jax.Array, possession: jax.Array, actions: jax.Array,
    params: EnvParams,
) -> jax.Array:
    """Resolve possession bids (ACTION SPEC above). Returns new owner body
    index ([] int32, -1 = loose ball)."""
    dtype = state_pos.dtype
    ball = state_pos[0]
    players = state_pos[1:]
    d = jnp.sqrt(jnp.sum((players - ball) ** 2, axis=-1))    # [P]
    within = d <= jnp.asarray(params.possession_radius, dtype)
    bids = (actions[:, 1] == ACT_PRESS) & within             # [P]

    big = jnp.asarray(jnp.finfo(dtype).max, dtype)
    bid_d = jnp.where(bids, d, big)
    best = jnp.argmin(bid_d)                                 # nearest; ties -> lowest idx
    any_bid = jnp.any(bids)
    bid_winner = (best + 1).astype(jnp.int32)                # player idx -> body idx

    # Current owner keeps the ball only while in reach.
    owner_player = possession - 1                            # -2 if none (clipped below)
    owner_within = jnp.where(
        possession > 0, within[jnp.clip(owner_player, 0, d.shape[0] - 1)], False
    )
    keep = jnp.where(owner_within, possession, jnp.asarray(-1, jnp.int32))
    return jnp.where(any_bid, bid_winner, keep)


# ---------------------------------------------------------------------------
# Kicks (pass / shoot)
# ---------------------------------------------------------------------------


def _rot(v: jax.Array, theta: jax.Array) -> jax.Array:
    c, s = jnp.cos(theta), jnp.sin(theta)
    return jnp.stack([c * v[0] - s * v[1], s * v[0] + c * v[1]])


def apply_kick(
    pos: jax.Array, vel: jax.Array, possession: jax.Array,
    actions: jax.Array, key: jax.Array, params: EnvParams,
) -> tuple[jax.Array, jax.Array]:
    """Owner's pass/shoot -> ball impulse + possession release.

    Returns (new ball velocity applied into vel, new possession).
    """
    dtype = pos.dtype
    ppt = params.players_per_team
    n_players = 2 * ppt
    eps = jnp.asarray(1e-9, dtype)

    has_owner = possession > 0
    owner_p = jnp.clip(possession - 1, 0, n_players - 1)     # player index
    owner_act = actions[owner_p, 1]
    do_pass = has_owner & (owner_act == ACT_PASS)
    do_shoot = has_owner & (owner_act == ACT_SHOOT)

    owner_pos = pos[possession.clip(0)]                      # body index (safe: >0 when used)
    owner_team = (owner_p >= ppt).astype(jnp.int32)          # 0 or 1
    ball = pos[0]

    # shoot target: opponent goal mouth center
    goal_x = jnp.where(
        owner_team == 0, jnp.asarray(params.width, dtype), jnp.asarray(0.0, dtype)
    )
    goal = jnp.stack([goal_x, jnp.asarray(params.height / 2.0, dtype)])
    shoot_dir = goal - ball
    shoot_dir = shoot_dir / jnp.maximum(jnp.linalg.norm(shoot_dir), eps)

    # pass target: nearest teammate of the owner
    players = pos[1:]
    team_of = (jnp.arange(n_players) >= ppt).astype(jnp.int32)
    is_mate = (team_of == owner_team) & (jnp.arange(n_players) != owner_p)
    d_mate = jnp.sqrt(jnp.sum((players - owner_pos) ** 2, axis=-1))
    big = jnp.asarray(jnp.finfo(dtype).max, dtype)
    mate = jnp.argmin(jnp.where(is_mate, d_mate, big))
    pass_dir = players[mate] - ball
    pass_dir = pass_dir / jnp.maximum(jnp.linalg.norm(pass_dir), eps)
    # 1v1 has no teammate: fall back to shooting direction
    has_mate = jnp.any(is_mate)
    pass_dir = jnp.where(has_mate, pass_dir, shoot_dir)

    theta = jax.random.normal(key, (), dtype) * jnp.asarray(params.kick_noise, dtype)
    kick_dir = jnp.where(do_shoot, _rot(shoot_dir, theta), _rot(pass_dir, theta))
    power = jnp.where(
        do_shoot, jnp.asarray(params.shoot_power, dtype),
        jnp.asarray(params.pass_power, dtype),
    )
    kicked = do_pass | do_shoot
    impulse = jnp.where(kicked, power, jnp.asarray(0.0, dtype))
    dv = kick_dir * impulse / jnp.asarray(params.ball_mass, dtype)
    vel = vel.at[0].add(jnp.where(kicked, dv, jnp.zeros_like(dv)))
    possession = jnp.where(kicked, jnp.asarray(-1, jnp.int32), possession)
    return vel, possession


# ---------------------------------------------------------------------------
# Dribble coupling
# ---------------------------------------------------------------------------


def apply_dribble(
    pos: jax.Array, vel: jax.Array, possession: jax.Array,
    actions: jax.Array, params: EnvParams,
) -> tuple[jax.Array, jax.Array]:
    """Carry the ball with its owner (post-physics override, ACTION SPEC)."""
    dtype = pos.dtype
    ppt = params.players_per_team
    has_owner = possession > 0
    owner_b = possession.clip(0)
    owner_p = jnp.clip(possession - 1, 0, 2 * ppt - 1)

    direction = actions[owner_p, 0]
    unit = _DIRS.astype(dtype)[direction]
    # facing fallback: team 0 faces +x, team 1 faces -x
    owner_team = (owner_p >= ppt).astype(jnp.int32)
    fallback = jnp.where(
        owner_team == 0,
        jnp.asarray([1.0, 0.0], dtype),
        jnp.asarray([-1.0, 0.0], dtype),
    )
    moving = jnp.any(unit != 0)
    carry_dir = jnp.where(moving, unit, fallback)

    offset = jnp.asarray(
        params.player_radius + params.ball_radius + params.dribble_offset, dtype
    )
    carried_pos = pos[owner_b] + carry_dir * offset
    carried_vel = vel[owner_b]

    new_ball_pos = jnp.where(has_owner, carried_pos, pos[0])
    new_ball_vel = jnp.where(has_owner, carried_vel, vel[0])
    return pos.at[0].set(new_ball_pos), vel.at[0].set(new_ball_vel)


# ---------------------------------------------------------------------------
# Goals, OOB, kickoff reset
# ---------------------------------------------------------------------------


def detect_goal(pos: jax.Array, params: EnvParams) -> jax.Array:
    """[2] bool: goal scored by team 0 (ball past right line), team 1 (left).

    GOAL SPEC above; SURVEY.md §3.3 "goal check: ball x beyond goal line
    within goal mouth".
    """
    x, y = pos[0, 0], pos[0, 1]
    in_mouth = (y >= params.goal_y_lo) & (y <= params.goal_y_hi)
    g0 = (x > params.width) & in_mouth    # team 0 scores on right goal
    g1 = (x < 0.0) & in_mouth             # team 1 scores on left goal
    return jnp.stack([g0, g1])


def clamp_oob(
    pos: jax.Array, vel: jax.Array, params: EnvParams
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Clamp bodies into the field (SURVEY.md §3.3 'out-of-bounds clamping').

    Players are always clamped. The ball is clamped in y, and in x only
    outside the goal mouth (a ball inside the mouth is about to be a
    goal). Returns (pos, vel, ball_was_clamped).
    """
    dtype = pos.dtype
    n_bodies = pos.shape[0]
    r = jnp.concatenate([
        jnp.asarray([params.ball_radius], dtype),
        jnp.full((n_bodies - 1,), params.player_radius, dtype),
    ])
    lo = jnp.stack([r, r], axis=-1)
    hi = jnp.stack(
        [jnp.asarray(params.width, dtype) - r, jnp.asarray(params.height, dtype) - r],
        axis=-1,
    )
    clamped = jnp.clip(pos, lo, hi)

    ball_y = pos[0, 1]
    in_mouth = (ball_y >= params.goal_y_lo) & (ball_y <= params.goal_y_hi)
    # ball: free x while in mouth, else clamped
    ball_new = jnp.where(
        in_mouth, jnp.stack([pos[0, 0], clamped[0, 1]]), clamped[0]
    )
    out = clamped.at[0].set(ball_new)
    ball_was_clamped = jnp.any(jnp.abs(out[0] - pos[0]) > 0)
    # zero the velocity component that got clamped (plastic wall fallback)
    vel = jnp.where(jnp.abs(out - pos) > 0, jnp.zeros_like(vel), vel)
    return out, vel, ball_was_clamped


def kickoff_positions(
    key: jax.Array, params: EnvParams, dtype=jnp.float32
) -> tuple[jax.Array, jax.Array]:
    """Initial / post-goal placement (SURVEY.md §3.2): ball at center with
    noise, teams in mirrored columns at width/4 and 3*width/4 spread in y.
    Returns (pos [n_bodies,2], vel zeros)."""
    ppt = params.players_per_team
    w, h = params.width, params.height

    kb, kp = jax.random.split(key)
    ball = jnp.asarray([w / 2.0, h / 2.0], dtype) + jax.random.uniform(
        kb, (2,), dtype, -1.0, 1.0
    ) * jnp.asarray(0.02 * h, dtype)

    ys = (jnp.arange(ppt, dtype=dtype) + 1.0) * (h / (ppt + 1.0))
    team0 = jnp.stack([jnp.full((ppt,), w / 4.0, dtype), ys], axis=-1)
    team1 = jnp.stack([jnp.full((ppt,), 3.0 * w / 4.0, dtype), ys], axis=-1)
    noise = jax.random.uniform(kp, (2 * ppt, 2), dtype, -1.0, 1.0) * jnp.asarray(
        0.02 * h, dtype
    )
    players = jnp.concatenate([team0, team1], axis=0) + noise
    pos = jnp.concatenate([ball[None], players], axis=0)
    return pos, jnp.zeros_like(pos)


# ---------------------------------------------------------------------------
# Rewards
# ---------------------------------------------------------------------------


def _ball_goal_dist(pos: jax.Array, params: EnvParams, team: int) -> jax.Array:
    """Distance from ball to the goal *team* attacks."""
    dtype = pos.dtype
    gx = params.width if team == 0 else 0.0
    goal = jnp.asarray([gx, params.height / 2.0], dtype)
    return jnp.linalg.norm(pos[0] - goal)


def _nearest_player_ball_dist(
    pos: jax.Array, params: EnvParams, team: int
) -> jax.Array:
    ppt = params.players_per_team
    sl = slice(1, 1 + ppt) if team == 0 else slice(1 + ppt, 1 + 2 * ppt)
    d = jnp.sqrt(jnp.sum((pos[sl] - pos[0]) ** 2, axis=-1))
    return jnp.min(d)


def shaped_rewards(
    pos_before: jax.Array, pos_after: jax.Array, possession: jax.Array,
    goals: jax.Array, ball_clamped: jax.Array, params: EnvParams,
) -> jax.Array:
    """[2] per-team shaped reward (SURVEY.md §2.1 #8; coefficients in
    :class:`RewardConfig` are our spec, driver-compatible)."""
    dtype = pos_before.dtype
    rc = params.rewards
    ppt = params.players_per_team

    rews = []
    for team in (0, 1):
        r = jnp.asarray(rc.time_penalty, dtype)
        # terminal goal terms
        r = r + jnp.where(goals[team], jnp.asarray(rc.goal, dtype), 0.0)
        r = r + jnp.where(goals[1 - team], jnp.asarray(rc.concede, dtype), 0.0)
        # ball progressed toward the goal we attack
        d0 = _ball_goal_dist(pos_before, params, team)
        d1 = _ball_goal_dist(pos_after, params, team)
        r = r + jnp.asarray(rc.ball_to_goal_delta, dtype) * (d0 - d1)
        # nearest player closed on the ball
        p0 = _nearest_player_ball_dist(pos_before, params, team)
        p1 = _nearest_player_ball_dist(pos_after, params, team)
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
    return jnp.stack(rews)
