"""Entity views: Player / Ball / Team accessors over the flat EnvState.

The reference wraps each pymunk body in ``Player`` / ``Ball`` (and groups
players into a ``Team``) with position/velocity accessors and a has-ball
predicate (SURVEY.md §2.1 #5, [RECALL-M]). The TPU-native engine keeps
world state as flat arrays (types.py body-layout convention) because
object graphs don't vectorize; these *read-only views* restore the
reference's ergonomics for debugging, rendering, and scripted policies
without ever copying state.

All accessors are plain array reads, so they work on single-env states
([n_bodies, 2] leaves) and batched states ([B, n_bodies, 2] leaves) alike
— the batch axis simply rides along.
"""

from __future__ import annotations

import dataclasses

import jax

from .types import EnvParams, EnvState

BALL = 0  # body index of the ball (types.py convention)


@dataclasses.dataclass(frozen=True)
class Ball:
    """Read-only view of body 0."""

    state: EnvState

    @property
    def position(self) -> jax.Array:
        return self.state.pos[..., BALL, :]

    @property
    def velocity(self) -> jax.Array:
        return self.state.vel[..., BALL, :]

    @property
    def owner(self) -> jax.Array:
        """Body index of the possessing player, or -1 if free."""
        return self.state.possession

    @property
    def is_free(self) -> jax.Array:
        return self.state.possession < 0


@dataclasses.dataclass(frozen=True)
class Player:
    """Read-only view of one player body."""

    state: EnvState
    body: int            # body index, 1 .. 2*ppt
    params: EnvParams

    def __post_init__(self):
        if not 1 <= self.body <= self.params.n_players:
            raise IndexError(f"player body index out of range: {self.body}")

    @property
    def team(self) -> int:
        return 0 if self.body <= self.params.players_per_team else 1

    @property
    def position(self) -> jax.Array:
        return self.state.pos[..., self.body, :]

    @property
    def velocity(self) -> jax.Array:
        return self.state.vel[..., self.body, :]

    @property
    def has_ball(self) -> jax.Array:
        return self.state.possession == self.body


@dataclasses.dataclass(frozen=True)
class Team:
    """Read-only view of one team's players."""

    state: EnvState
    team: int            # 0 (attacks right goal) or 1 (attacks left)
    params: EnvParams

    @property
    def _sl(self) -> slice:
        ppt = self.params.players_per_team
        lo = 1 + self.team * ppt
        return slice(lo, lo + ppt)

    @property
    def players(self) -> tuple[Player, ...]:
        sl = self._sl
        return tuple(
            Player(self.state, b, self.params)
            for b in range(sl.start, sl.stop)
        )

    @property
    def positions(self) -> jax.Array:
        return self.state.pos[..., self._sl, :]

    @property
    def velocities(self) -> jax.Array:
        return self.state.vel[..., self._sl, :]

    @property
    def has_ball(self) -> jax.Array:
        sl = self._sl
        p = self.state.possession
        return (p >= sl.start) & (p < sl.stop)

    @property
    def score(self) -> jax.Array:
        return self.state.score[..., self.team]
