"""Unit tests for game logic: possession tie-breaks, goal-line edge cases,
OOB clamp, kicks, rewards (SURVEY.md §4.2 item 2)."""

import jax
import jax.numpy as jnp
import numpy as np

from gym_futbol_tpu import game
from gym_futbol_tpu.types import EnvParams


P = EnvParams(players_per_team=2)
DT = jnp.float32


def mk_pos(ball, players):
    return jnp.asarray([ball] + players, DT)


def actions_of(*pairs):
    return jnp.asarray(pairs, jnp.int32)


class TestDecode:
    def test_directions_and_dash(self):
        p = EnvParams(players_per_team=1)
        a = actions_of([1, 0], [2, 1])  # p1: up noop, p2: right dash
        f = game.decode_forces(a, p, DT)
        np.testing.assert_allclose(np.asarray(f[0]), [0.0, 0.0])  # ball row
        np.testing.assert_allclose(np.asarray(f[1]), [0.0, p.move_force])
        np.testing.assert_allclose(
            np.asarray(f[2]), [p.move_force * p.dash_multiplier, 0.0]
        )

    def test_noop_zero_force(self):
        p = EnvParams(players_per_team=1)
        f = game.decode_forces(actions_of([0, 0], [0, 4]), p, DT)
        np.testing.assert_allclose(np.asarray(f), 0.0)


class TestPossession:
    def test_nearest_bidder_wins(self):
        pos = mk_pos([300.0, 200.0], [[310.0, 200.0], [330.0, 200.0],
                                      [500.0, 100.0], [520.0, 100.0]])
        a = actions_of([0, 2], [0, 2], [0, 0], [0, 0])  # both team0 press
        owner = game.update_possession(pos, jnp.asarray(-1, jnp.int32), a, P)
        assert int(owner) == 1  # body index of nearest bidder

    def test_tie_breaks_to_lowest_index(self):
        pos = mk_pos([300.0, 200.0], [[310.0, 200.0], [290.0, 200.0],
                                      [500.0, 100.0], [520.0, 100.0]])
        a = actions_of([0, 2], [0, 2], [0, 0], [0, 0])  # equidistant bids
        owner = game.update_possession(pos, jnp.asarray(-1, jnp.int32), a, P)
        assert int(owner) == 1

    def test_out_of_range_bid_ignored(self):
        pos = mk_pos([300.0, 200.0], [[300.0 + P.possession_radius + 1, 200.0],
                                      [100.0, 100.0], [500.0, 100.0],
                                      [520.0, 100.0]])
        a = actions_of([0, 2], [0, 0], [0, 0], [0, 0])
        owner = game.update_possession(pos, jnp.asarray(-1, jnp.int32), a, P)
        assert int(owner) == -1

    def test_owner_keeps_without_bid(self):
        pos = mk_pos([300.0, 200.0], [[310.0, 200.0], [100.0, 100.0],
                                      [500.0, 100.0], [520.0, 100.0]])
        a = actions_of([0, 0], [0, 0], [0, 0], [0, 0])
        owner = game.update_possession(pos, jnp.asarray(1, jnp.int32), a, P)
        assert int(owner) == 1

    def test_owner_loses_when_out_of_reach(self):
        pos = mk_pos([300.0, 200.0], [[300.0 + P.possession_radius + 5, 200.0],
                                      [100.0, 100.0], [500.0, 100.0],
                                      [520.0, 100.0]])
        a = actions_of([0, 0], [0, 0], [0, 0], [0, 0])
        owner = game.update_possession(pos, jnp.asarray(1, jnp.int32), a, P)
        assert int(owner) == -1

    def test_steal_by_closer_opponent(self):
        pos = mk_pos([300.0, 200.0], [[320.0, 200.0], [100.0, 100.0],
                                      [305.0, 200.0], [520.0, 100.0]])
        a = actions_of([0, 0], [0, 0], [0, 2], [0, 0])  # opponent presses
        owner = game.update_possession(pos, jnp.asarray(1, jnp.int32), a, P)
        assert int(owner) == 3


class TestKick:
    def test_shoot_toward_opponent_goal(self, key):
        p = EnvParams(players_per_team=1, kick_noise=0.0)
        pos = mk_pos([310.0, 200.0], [[300.0, 200.0], [500.0, 200.0]])
        vel = jnp.zeros((3, 2), DT)
        a = actions_of([0, 4], [0, 0])  # team0 owner shoots
        new_vel, owner = game.apply_kick(
            pos, vel, jnp.asarray(1, jnp.int32), a, key, p
        )
        assert int(owner) == -1  # released
        bv = np.asarray(new_vel[0])
        assert bv[0] > 0  # toward x = width (right goal)
        np.testing.assert_allclose(
            np.linalg.norm(bv), p.shoot_power / p.ball_mass, rtol=1e-5
        )

    def test_team1_shoots_left(self, key):
        p = EnvParams(players_per_team=1, kick_noise=0.0)
        pos = mk_pos([310.0, 200.0], [[500.0, 200.0], [300.0, 200.0]])
        vel = jnp.zeros((3, 2), DT)
        a = actions_of([0, 0], [0, 4])
        new_vel, _ = game.apply_kick(pos, vel, jnp.asarray(2, jnp.int32), a, key, p)
        assert float(new_vel[0, 0]) < 0

    def test_pass_toward_nearest_teammate(self, key):
        p = EnvParams(players_per_team=2, kick_noise=0.0)
        pos = mk_pos([210.0, 200.0], [[200.0, 200.0], [200.0, 300.0],
                                      [500.0, 100.0], [520.0, 100.0]])
        vel = jnp.zeros((5, 2), DT)
        a = actions_of([0, 3], [0, 0], [0, 0], [0, 0])
        new_vel, _ = game.apply_kick(pos, vel, jnp.asarray(1, jnp.int32), a, key, p)
        bv = np.asarray(new_vel[0])
        # teammate at (200,300): direction mostly +y
        assert bv[1] > abs(bv[0])
        np.testing.assert_allclose(
            np.linalg.norm(bv), p.pass_power / p.ball_mass, rtol=1e-5
        )

    def test_non_owner_cannot_kick(self, key):
        vel = jnp.zeros((5, 2), DT)
        pos = mk_pos([210.0, 200.0], [[200.0, 200.0], [200.0, 300.0],
                                      [500.0, 100.0], [520.0, 100.0]])
        a = actions_of([0, 4], [0, 4], [0, 4], [0, 4])
        new_vel, owner = game.apply_kick(
            pos, vel, jnp.asarray(-1, jnp.int32), a, key, P
        )
        np.testing.assert_allclose(np.asarray(new_vel), 0.0)
        assert int(owner) == -1


class TestDribble:
    def test_ball_carried_in_commanded_direction(self):
        p = EnvParams(players_per_team=1)
        pos = mk_pos([290.0, 200.0], [[300.0, 200.0], [500.0, 200.0]])
        vel = jnp.asarray([[0.0, 0.0], [25.0, 0.0], [0.0, 0.0]], DT)
        a = actions_of([2, 0], [0, 0])  # owner moving right
        new_pos, new_vel = game.apply_dribble(pos, vel, jnp.asarray(1, jnp.int32), a, p)
        off = p.player_radius + p.ball_radius + p.dribble_offset
        np.testing.assert_allclose(np.asarray(new_pos[0]), [300.0 + off, 200.0],
                                   rtol=1e-5)
        np.testing.assert_allclose(np.asarray(new_vel[0]), [25.0, 0.0])

    def test_free_ball_untouched(self):
        pos = mk_pos([290.0, 200.0], [[300.0, 200.0], [100.0, 100.0],
                                      [500.0, 100.0], [520.0, 100.0]])
        vel = jnp.ones((5, 2), DT)
        a = jnp.zeros((4, 2), jnp.int32)
        new_pos, new_vel = game.apply_dribble(pos, vel, jnp.asarray(-1, jnp.int32), a, P)
        np.testing.assert_allclose(np.asarray(new_pos), np.asarray(pos))


class TestGoal:
    def test_goal_only_inside_mouth(self):
        y_mid = P.height / 2.0
        pos = mk_pos([P.width + 1.0, y_mid], [[0, 0]] * 4)
        g = game.detect_goal(pos, P)
        assert bool(g[0]) and not bool(g[1])

    def test_no_goal_outside_mouth(self):
        pos = mk_pos([P.width + 1.0, P.goal_y_hi + 5.0], [[0, 0]] * 4)
        g = game.detect_goal(pos, P)
        assert not bool(g[0]) and not bool(g[1])

    def test_goal_line_not_crossed(self):
        """Exactly on the line: not a goal yet (strict inequality)."""
        y_mid = P.height / 2.0
        pos = mk_pos([P.width, y_mid], [[0, 0]] * 4)
        g = game.detect_goal(pos, P)
        assert not bool(g[0])

    def test_left_goal_scores_for_team1(self):
        y_mid = P.height / 2.0
        pos = mk_pos([-1.0, y_mid], [[0, 0]] * 4)
        g = game.detect_goal(pos, P)
        assert bool(g[1]) and not bool(g[0])


class TestOOB:
    def test_player_clamped(self):
        pos = mk_pos([300.0, 200.0], [[-20.0, 200.0], [300.0, 500.0],
                                      [400.0, 100.0], [500.0, 100.0]])
        vel = jnp.ones((5, 2), DT) * -5.0
        out, _, ball_clamped = game.clamp_oob(pos, vel, P)
        out = np.asarray(out)
        assert out[1, 0] == P.player_radius
        assert out[2, 1] == P.height - P.player_radius
        assert not bool(ball_clamped)

    def test_ball_free_in_mouth(self):
        y_mid = P.height / 2.0
        pos = mk_pos([P.width + 3.0, y_mid], [[100, 100]] * 4)
        out, _, clamped = game.clamp_oob(pos, jnp.zeros((5, 2), DT), P)
        assert float(out[0, 0]) == P.width + 3.0
        assert not bool(clamped)

    def test_ball_clamped_outside_mouth(self):
        pos = mk_pos([P.width + 3.0, P.goal_y_hi + 20.0], [[100, 100]] * 4)
        out, _, clamped = game.clamp_oob(pos, jnp.zeros((5, 2), DT), P)
        assert float(out[0, 0]) == P.width - P.ball_radius
        assert bool(clamped)


class TestRewards:
    def test_goal_reward_signs(self):
        pos = mk_pos([300.0, 200.0], [[100, 100], [200, 100], [400, 100],
                                      [500, 100]])
        goals = jnp.asarray([True, False])
        r = game.shaped_rewards(pos, pos, jnp.asarray(-1, jnp.int32), goals,
                                jnp.asarray(False), P)
        r = np.asarray(r)
        assert r[0] >= P.rewards.goal - 1e-5
        assert r[1] <= P.rewards.concede + 1e-5

    def test_ball_progress_shaping_zero_sum_direction(self):
        """Ball moving right: good for team 0, bad for team 1."""
        pos0 = mk_pos([300.0, 200.0], [[100, 100], [200, 100], [400, 100],
                                       [500, 100]])
        pos1 = mk_pos([320.0, 200.0], [[100, 100], [200, 100], [400, 100],
                                       [500, 100]])
        r = np.asarray(
            game.shaped_rewards(pos0, pos1, jnp.asarray(-1, jnp.int32),
                                jnp.asarray([False, False]),
                                jnp.asarray(False), P)
        )
        assert r[0] > 0 and r[1] < 0

    def test_possession_bonus(self):
        pos = mk_pos([300.0, 200.0], [[300, 200], [200, 100], [400, 100],
                                      [500, 100]])
        r_own = np.asarray(
            game.shaped_rewards(pos, pos, jnp.asarray(1, jnp.int32),
                                jnp.asarray([False, False]),
                                jnp.asarray(False), P)
        )
        r_no = np.asarray(
            game.shaped_rewards(pos, pos, jnp.asarray(-1, jnp.int32),
                                jnp.asarray([False, False]),
                                jnp.asarray(False), P)
        )
        assert r_own[0] - r_no[0] == np.float32(P.rewards.possession_bonus)
