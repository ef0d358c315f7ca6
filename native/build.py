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
    lib.futbol_physics_step.argtypes = [
        ctypes.POINTER(ctypes.c_double),  # pos [n*2]
        ctypes.POINTER(ctypes.c_double),  # vel [n*2]
        ctypes.POINTER(ctypes.c_double),  # forces [n*2]
        ctypes.c_int,
        ctypes.POINTER(ctypes.c_double),  # params
    ]
    lib.futbol_physics_step.restype = None
    assert lib.futbol_oracle_abi_version() == 1
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
