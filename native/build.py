"""Build + ctypes loader for the C++ physics oracle.

Usage:
    from native.build import load_oracle
    lib = load_oracle()            # builds liboracle.so on first call
"""

from __future__ import annotations

import ctypes
import os
import subprocess

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "oracle.cpp")
_LIB = os.path.join(_DIR, "liboracle.so")


def build(force: bool = False) -> str:
    if force or not os.path.exists(_LIB) or (
        os.path.getmtime(_SRC) > os.path.getmtime(_LIB)
    ):
        subprocess.run(
            ["g++", "-O2", "-shared", "-fPIC", "-o", _LIB, _SRC],
            check=True, capture_output=True, text=True,
        )
    return _LIB


def load_oracle() -> ctypes.CDLL:
    lib = ctypes.CDLL(build())
    c_d = ctypes.POINTER(ctypes.c_double)
    c_i = ctypes.POINTER(ctypes.c_int32)
    lib.futbol_physics_step.argtypes = [
        c_d,  # pos [n*2]
        c_d,  # vel [n*2]
        c_d,  # forces [n*2]
        ctypes.c_int,
        c_d,  # params
    ]
    lib.futbol_physics_step.restype = None
    lib.futbol_env_step.argtypes = [
        c_d,              # pos [n*2] in/out
        c_d,              # vel [n*2] in/out
        c_i,              # possession [1] in/out
        c_i,              # score [2] in/out
        c_i,              # t [1] in/out
        c_i,              # actions [n_players*2]
        ctypes.c_double,  # theta (pre-scaled kick noise angle)
        c_d,              # kickoff_noise [n*2] in [-1, 1]
        c_d,              # reward [2] out
        c_i,              # done [1] out
        ctypes.c_int,     # auto_reset
        ctypes.c_int,     # n_bodies
        c_d,              # phys params
        c_d,              # game params
    ]
    lib.futbol_env_step.restype = None
    assert lib.futbol_oracle_abi_version() == 3
    return lib


def params_array(params) -> "list[float]":
    """Flatten EnvParams into the oracle's Params struct layout (see
    oracle.cpp). Order must match exactly."""
    return [
        params.width, params.height, params.goal_size,
        params.player_radius, params.ball_radius,
        params.player_mass, params.ball_mass,
        params.player_elasticity, params.ball_elasticity,
        params.wall_elasticity,
        params.friction, params.dt, float(params.substeps), params.damping,
        float(params.solver_iterations), params.collision_slop,
        params.baumgarte, params.max_speed,
    ]


def game_params_array(params) -> "list[float]":
    """Flatten the game-logic constants into the oracle's GameParams
    layout (see oracle.cpp). Order must match exactly."""
    rc = params.rewards
    return [
        params.move_force, params.dash_multiplier,
        params.possession_radius, params.dribble_offset,
        params.pass_power, params.shoot_power,
        params.placement_noise,
        float(params.max_steps),
        rc.goal, rc.concede, rc.ball_to_goal_delta, rc.player_to_ball_delta,
        rc.possession_bonus, rc.oob_penalty, rc.time_penalty,
    ]


def oracle_env_step(lib, pos, vel, possession, score, t, actions, theta,
                    kickoff_noise, params, auto_reset=False):
    """numpy convenience wrapper over futbol_env_step. Returns
    (pos, vel, possession, score, t, reward[2], done)."""
    import numpy as np

    pos = np.ascontiguousarray(pos, np.float64).copy()
    vel = np.ascontiguousarray(vel, np.float64).copy()
    poss = np.asarray([possession], np.int32)
    score = np.ascontiguousarray(score, np.int32).copy()
    tt = np.asarray([t], np.int32)
    actions = np.ascontiguousarray(actions, np.int32).reshape(-1)
    noise = np.ascontiguousarray(kickoff_noise, np.float64).reshape(-1)
    reward = np.zeros(2, np.float64)
    done = np.zeros(1, np.int32)
    pp = np.asarray(params_array(params), np.float64)
    gp = np.asarray(game_params_array(params), np.float64)
    c_d = ctypes.POINTER(ctypes.c_double)
    c_i = ctypes.POINTER(ctypes.c_int32)
    lib.futbol_env_step(
        pos.ctypes.data_as(c_d), vel.ctypes.data_as(c_d),
        poss.ctypes.data_as(c_i), score.ctypes.data_as(c_i),
        tt.ctypes.data_as(c_i), actions.ctypes.data_as(c_i),
        ctypes.c_double(float(theta)), noise.ctypes.data_as(c_d),
        reward.ctypes.data_as(c_d), done.ctypes.data_as(c_i),
        int(auto_reset), pos.shape[0], pp.ctypes.data_as(c_d),
        gp.ctypes.data_as(c_d),
    )
    return pos, vel, int(poss[0]), score, int(tt[0]), reward, bool(done[0])


def oracle_physics_step(lib, pos, vel, forces, params):
    """numpy convenience wrapper: [n,2] float64 arrays in, new (pos, vel) out."""
    import numpy as np

    pos = np.ascontiguousarray(pos, np.float64).copy()
    vel = np.ascontiguousarray(vel, np.float64).copy()
    forces = np.ascontiguousarray(forces, np.float64)
    pp = np.asarray(params_array(params), np.float64)
    n = pos.shape[0]
    c_d = ctypes.POINTER(ctypes.c_double)
    lib.futbol_physics_step(
        pos.ctypes.data_as(c_d), vel.ctypes.data_as(c_d),
        forces.ctypes.data_as(c_d), n, pp.ctypes.data_as(c_d),
    )
    return pos, vel
