"""Unit tests for the physics kernel (SURVEY.md §4.2 item 2:
integrator vs closed form, single contact pair vs hand-computed impulse)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gym_futbol_tpu.physics import (
    circle_pairs,
    integrate_velocity,
    physics_step,
    solve_contacts,
)
from gym_futbol_tpu.types import EnvParams, body_masses


def make_params(**kw):
    return EnvParams(**kw)


class TestIntegrator:
    def test_velocity_update_closed_form(self):
        """v' = v * damping^dt + (f/m) dt — the Chipmunk rule (physics.py spec)."""
        p = make_params()
        dt = 0.01
        v = jnp.asarray([[3.0, -2.0]])
        f = jnp.asarray([[10.0, 20.0]])
        inv_m = jnp.asarray([0.5])
        out = integrate_velocity(v, f, inv_m, p, dt)
        expected = np.array([[3.0, -2.0]]) * (p.damping**dt) + np.array(
            [[10.0, 20.0]]
        ) * 0.5 * dt
        np.testing.assert_allclose(np.asarray(out), expected, rtol=1e-5)

    def test_speed_clamp(self):
        p = make_params(max_speed=10.0)
        v = jnp.asarray([[100.0, 0.0]])
        out = integrate_velocity(v, jnp.zeros((1, 2)), jnp.asarray([1.0]), p, 0.01)
        assert np.linalg.norm(np.asarray(out)) <= 10.0 + 1e-5

    def test_free_body_trajectory(self):
        """No contacts, no force: x advances by v*dt each substep with damping."""
        p = make_params(players_per_team=1, damping=1.0, substeps=4)
        n = p.n_bodies
        pos = jnp.asarray([[300.0, 200.0], [100.0, 100.0], [500.0, 300.0]])
        vel = jnp.asarray([[10.0, 5.0], [0.0, 0.0], [0.0, 0.0]])
        f = jnp.zeros((n, 2))
        new_pos, new_vel = physics_step(pos, vel, f, p)
        np.testing.assert_allclose(
            np.asarray(new_pos[0]), [300.0 + 10 * p.dt, 200.0 + 5 * p.dt], rtol=1e-5
        )
        np.testing.assert_allclose(np.asarray(new_vel[0]), [10.0, 5.0], rtol=1e-5)


class TestContacts:
    def test_pair_order_is_lexicographic(self):
        assert circle_pairs(3) == [(0, 1), (0, 2), (1, 2)]

    def test_head_on_equal_mass_elastic(self):
        """Two equal circles, e=1: velocities exchange (hand-computed impulse)."""
        p = make_params(
            players_per_team=1, player_elasticity=1.0, friction=0.0,
            baumgarte=0.0,
        )
        dtype = jnp.float32
        inv_mass = 1.0 / body_masses(p, dtype)
        from gym_futbol_tpu.types import body_elasticities, body_radii

        radii = body_radii(p, dtype)
        elas = body_elasticities(p, dtype)
        # players are bodies 1 and 2 (equal mass); overlap slightly, approaching
        pos = jnp.asarray([[50.0, 350.0], [100.0, 100.0], [129.0, 100.0]], dtype)
        vel = jnp.asarray([[0.0, 0.0], [10.0, 0.0], [-10.0, 0.0]], dtype)
        out = solve_contacts(pos, vel, p, inv_mass, radii, elas)
        out = np.asarray(out)
        # e=1 head-on equal mass: velocities swap
        np.testing.assert_allclose(out[1], [-10.0, 0.0], atol=0.2)
        np.testing.assert_allclose(out[2], [10.0, 0.0], atol=0.2)

    def test_inelastic_rest(self):
        """e=0 head-on equal mass: both stop (momentum conserved)."""
        p = make_params(
            players_per_team=1, player_elasticity=0.0, friction=0.0,
            baumgarte=0.0,
        )
        from gym_futbol_tpu.types import body_elasticities, body_radii

        dtype = jnp.float32
        inv_mass = 1.0 / body_masses(p, dtype)
        pos = jnp.asarray([[50.0, 350.0], [100.0, 100.0], [129.0, 100.0]], dtype)
        vel = jnp.asarray([[0.0, 0.0], [10.0, 0.0], [-10.0, 0.0]], dtype)
        out = np.asarray(
            solve_contacts(pos, vel, p, inv_mass, body_radii(p, dtype),
                           body_elasticities(p, dtype))
        )
        np.testing.assert_allclose(out[1], [0.0, 0.0], atol=0.2)
        np.testing.assert_allclose(out[2], [0.0, 0.0], atol=0.2)

    def test_momentum_conserved_pairwise(self):
        """Circle-circle impulses are equal/opposite => momentum conserved
        when no walls involved."""
        p = make_params(players_per_team=2, friction=0.3, baumgarte=0.0)
        from gym_futbol_tpu.types import body_elasticities, body_radii

        dtype = jnp.float32
        masses = body_masses(p, dtype)
        inv_mass = 1.0 / masses
        key = jax.random.PRNGKey(3)
        # cluster bodies mid-field so nobody touches a wall
        pos = jnp.asarray(
            [[300.0, 200.0], [310.0, 205.0], [290.0, 195.0], [305.0, 185.0],
             [285.0, 210.0]], dtype
        )
        vel = jax.random.normal(key, (5, 2), dtype) * 30.0
        out = solve_contacts(pos, vel, p, inv_mass, body_radii(p, dtype),
                             body_elasticities(p, dtype))
        p_before = np.asarray(jnp.sum(vel * masses[:, None], axis=0))
        p_after = np.asarray(jnp.sum(out * masses[:, None], axis=0))
        np.testing.assert_allclose(p_after, p_before, rtol=1e-3, atol=1e-2)

    def test_no_contact_is_identity(self):
        p = make_params(players_per_team=1)
        from gym_futbol_tpu.types import body_elasticities, body_radii

        dtype = jnp.float32
        inv_mass = 1.0 / body_masses(p, dtype)
        pos = jnp.asarray([[300.0, 200.0], [100.0, 100.0], [500.0, 300.0]], dtype)
        vel = jnp.asarray([[1.0, 2.0], [3.0, 4.0], [5.0, 6.0]], dtype)
        out = solve_contacts(pos, vel, p, inv_mass, body_radii(p, dtype),
                             body_elasticities(p, dtype))
        np.testing.assert_allclose(np.asarray(out), np.asarray(vel), rtol=1e-6)


class TestWalls:
    def test_wall_bounce(self):
        """Ball into bottom wall reflects with restitution e_ball*e_wall."""
        p = make_params(players_per_team=1, friction=0.0, baumgarte=0.0)
        from gym_futbol_tpu.types import body_elasticities, body_radii

        dtype = jnp.float32
        inv_mass = 1.0 / body_masses(p, dtype)
        # ball barely penetrating the bottom wall, moving down
        pos = jnp.asarray([[300.0, 9.0], [100.0, 200.0], [500.0, 200.0]], dtype)
        vel = jnp.asarray([[0.0, -50.0], [0.0, 0.0], [0.0, 0.0]], dtype)
        out = np.asarray(
            solve_contacts(pos, vel, p, inv_mass, body_radii(p, dtype),
                           body_elasticities(p, dtype))
        )
        e = p.ball_elasticity * p.wall_elasticity
        np.testing.assert_allclose(out[0, 1], 50.0 * e, rtol=0.05)

    def test_ball_passes_through_goal_mouth(self):
        """Side wall inactive for the ball inside the mouth (physics spec 2)."""
        p = make_params(players_per_team=1)
        from gym_futbol_tpu.types import body_elasticities, body_radii

        dtype = jnp.float32
        inv_mass = 1.0 / body_masses(p, dtype)
        y_mid = p.height / 2.0
        pos = jnp.asarray([[5.0, y_mid], [300.0, 100.0], [400.0, 300.0]], dtype)
        vel = jnp.asarray([[-80.0, 0.0], [0.0, 0.0], [0.0, 0.0]], dtype)
        out = np.asarray(
            solve_contacts(pos, vel, p, inv_mass, body_radii(p, dtype),
                           body_elasticities(p, dtype))
        )
        # unchanged: no wall contact for the ball in the mouth
        np.testing.assert_allclose(out[0], [-80.0, 0.0], rtol=1e-6)

    def test_player_blocked_at_goal_mouth(self):
        """Players never pass through side walls (physics spec 2)."""
        p = make_params(players_per_team=1, friction=0.0, baumgarte=0.0)
        from gym_futbol_tpu.types import body_elasticities, body_radii

        dtype = jnp.float32
        inv_mass = 1.0 / body_masses(p, dtype)
        y_mid = p.height / 2.0
        pos = jnp.asarray([[300.0, 100.0], [10.0, y_mid], [400.0, 300.0]], dtype)
        vel = jnp.asarray([[0.0, 0.0], [-50.0, 0.0], [0.0, 0.0]], dtype)
        out = np.asarray(
            solve_contacts(pos, vel, p, inv_mass, body_radii(p, dtype),
                           body_elasticities(p, dtype))
        )
        assert out[1, 0] > -50.0 * 0.5  # strongly slowed/reflected


class TestStability:
    @pytest.mark.parametrize("ppt", [1, 2, 3, 5])
    def test_long_run_finite(self, ppt):
        p = make_params(players_per_team=ppt)
        key = jax.random.PRNGKey(ppt)
        n = p.n_bodies
        k1, k2 = jax.random.split(key)
        pos = jax.random.uniform(k1, (n, 2)) * jnp.asarray([p.width, p.height])
        vel = jax.random.normal(k2, (n, 2)) * 50.0
        f = jnp.zeros((n, 2))
        step = jax.jit(lambda s: physics_step(s[0], s[1], f, p))
        for _ in range(50):
            pos, vel = step((pos, vel))
        assert np.isfinite(np.asarray(pos)).all()
        assert np.isfinite(np.asarray(vel)).all()
        assert (np.abs(np.asarray(vel)) <= p.max_speed + 1e-3).all()
