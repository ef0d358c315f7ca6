"""Environment registration — the ``gym.make`` equivalent.

The reference registers its env id(s) with the OpenAI-Gym global registry
so users write ``gym.make("gym_futbol:futbol-v0")`` (SURVEY.md §2.1 #1,
§3.1 — mount empty at build time, exact id unverified). This module gives
the same entry-point ergonomics without depending on gym: a tiny registry
mapping string ids to :class:`EnvParams` factories.

    from gym_futbol_tpu import make
    env = make("futbol-v0")                    # stateful Gym-style class
    params = make_params("futbol-3v3-v0")      # just the params (pure API)

Registered ids (team sizes mirror the driver's eval configs 1v1..5v5):
    futbol-v0            2v2 (the default)
    futbol-1v1-v0 .. futbol-5v5-v0
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable

from .types import EnvParams

_REGISTRY: dict[str, Callable[[], EnvParams]] = {}


def register(env_id: str, factory: Callable[[], EnvParams]) -> None:
    """Register an env id. Re-registering an existing id raises (same
    contract as gym's registry)."""
    if env_id in _REGISTRY:
        raise ValueError(f"env id already registered: {env_id!r}")
    _REGISTRY[env_id] = factory


def registered_ids() -> list[str]:
    return sorted(_REGISTRY)


def make_params(env_id: str, **overrides: Any) -> EnvParams:
    """Resolve an env id to EnvParams (for the pure-functional API)."""
    try:
        factory = _REGISTRY[env_id]
    except KeyError:
        raise KeyError(
            f"unknown env id {env_id!r}; registered: {registered_ids()}"
        ) from None
    params = factory()
    return dataclasses.replace(params, **overrides) if overrides else params


def make(env_id: str, seed: int = 0, **overrides: Any):
    """Gym-style constructor: returns a stateful :class:`FutbolEnv`."""
    from .env import FutbolEnv

    return FutbolEnv(make_params(env_id, **overrides), seed=seed)


def _register_defaults() -> None:
    register("futbol-v0", lambda: EnvParams(players_per_team=2))
    for ppt in (1, 2, 3, 4, 5):
        register(
            f"futbol-{ppt}v{ppt}-v0",
            lambda ppt=ppt: EnvParams(players_per_team=ppt),
        )


_register_defaults()
